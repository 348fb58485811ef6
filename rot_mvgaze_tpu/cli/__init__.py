"""L6 CLI / experiment wiring (parity target: /root/reference/main.py)."""

from rot_mvgaze_tpu.cli.main import build_experiment, get_parser, main

__all__ = ["build_experiment", "get_parser", "main"]
