#!/usr/bin/env python
"""Print the fully-resolved config (parity: tools/misc/print_config.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from sm3det_tpu.utils.config import Config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_cli_options(args.cfg_options))
    print(cfg.pretty_text)


if __name__ == "__main__":
    main()
