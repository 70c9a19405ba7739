"""Config helpers: YAML <-> nested namespaces (scripts/utils.py:75-91).

The reference's YAML schema (``data`` / ``model_name`` / ``model`` /
[``discriminator``] / ``loss`` blocks) loads unchanged; quirky ablation
keys are normalized downstream in ``make_model`` (SURVEY §7).
"""

from __future__ import annotations

import argparse

import yaml

__all__ = ["read_yaml", "dict2namespace", "namespace2dict"]


def read_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def dict2namespace(config: dict) -> argparse.Namespace:
    ns = argparse.Namespace()
    for key, value in config.items():
        setattr(ns, key,
                dict2namespace(value) if isinstance(value, dict) else value)
    return ns


def namespace2dict(config) -> dict:
    if isinstance(config, argparse.Namespace):
        return {k: namespace2dict(v) for k, v in vars(config).items()}
    return config
