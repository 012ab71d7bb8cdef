from .common import load_system, resolve_ground_state
