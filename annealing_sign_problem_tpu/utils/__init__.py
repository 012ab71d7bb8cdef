from .log import logger
from .timers import Timer, tick_tock
from .output import refuse_to_overwrite, atomic_write, provenance_header
