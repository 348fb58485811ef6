"""Reflective model construction from YAML config.

Parity with ``build_model_from_cfg`` (/root/reference/utils/util.py:19-29):
a YAML file like::

    type: rot_mvgaze_tpu.models.FeatRotationSymm
    params:
      backbone_depth: 18
      num_iter: 2

is resolved by import path and instantiated with ``params``.
"""

from __future__ import annotations

import importlib
from typing import Any

import yaml


def build_model_from_cfg(cfg_path: str) -> Any:
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    module, cls = cfg["type"].rsplit(".", 1)
    ctor = getattr(importlib.import_module(module), cls)
    return ctor(**(cfg.get("params") or {}))  # empty "params:" parses as None
