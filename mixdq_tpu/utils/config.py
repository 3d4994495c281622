"""Minimal OmegaConf-style config: YAML files -> attribute-access dicts.

Replaces the reference's OmegaConf usage (scripts/ptq.py, config contract
described in configs/stable-diffusion/sdxl_turbo.yaml:1-36). Only the
features the framework needs: load/save YAML, dotted attribute access,
``.get(key, default)``, dict merge.
"""

from __future__ import annotations

from typing import Any, Mapping

import yaml


class Config(dict):
    """A dict with attribute access that wraps nested dicts on the fly."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __getitem__(self, name: str) -> Any:
        v = super().__getitem__(name)
        if isinstance(v, dict) and not isinstance(v, Config):
            v = Config(v)
            super().__setitem__(name, v)
        return v

    def get(self, name: str, default: Any = None) -> Any:
        try:
            return self[name]
        except KeyError:
            return default


def load_config(path: str) -> Config:
    # every CLI script loads its config before first backend use, so this
    # is the one place the MIXDQ_PLATFORM=cpu smoke-flow hook can live
    from .platform import apply_platform_env

    apply_platform_env()
    with open(path) as f:
        return Config(yaml.safe_load(f))


def save_config(cfg: Mapping, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_plain(cfg), f, sort_keys=False)


def _plain(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def merge(base: Mapping, override: Mapping) -> Config:
    out = Config({k: v for k, v in base.items()})
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = v
    return out
