"""Write the built-in system specs as YAML files.

Emits all reference systems (j1j2 square, kagome 16/18/36, pyrochlore-32,
the four SK instances with the exact reference RNG stream —
generate_sk.py:4,38-41) into physical_systems/, so the directory layout of
the reference is reproduced from code.
"""

from __future__ import annotations

import argparse
import os
import sys

from .. import systems
from ..io import config_to_yaml
from ..utils.log import logger

ALL_SYSTEMS = (
    "j1j2_square_4x4",
    "heisenberg_kagome_16",
    "heisenberg_kagome_18",
    "heisenberg_kagome_36",
    "heisenberg_pyrochlore_2x2x2",
    "sk_16_1",
    "sk_16_2",
    "sk_16_3",
    "sk_32_1",
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate system YAML files.")
    parser.add_argument("--output-dir", type=str, default="physical_systems")
    parser.add_argument("--systems", type=str, default=",".join(ALL_SYSTEMS))
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    for name in args.systems.split(","):
        config = systems.get_system(name)
        path = os.path.join(args.output_dir, f"{name}.yaml")
        config_to_yaml(config, path)
        logger.info("Wrote {}", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
