"""Config helpers: YAML <-> nested namespaces (scripts/utils.py:75-91).

The reference's YAML schema (``data`` / ``model_name`` / ``model`` /
[``discriminator``] / ``loss`` blocks) loads unchanged; quirky ablation
keys are normalized downstream in ``make_model`` (SURVEY §7).
"""

from __future__ import annotations

import argparse

import yaml

__all__ = ["read_yaml", "dict2namespace", "namespace2dict",
           "download_data_hf"]


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


def download_data_hf(repo_id: str = "yzGuu830/dnscustom",
                     filename: str = "testset.tar.gz",
                     local_dir: str = "./data") -> str:
    """Fetch an evaluation-set tarball from the HF hub
    (scripts/utils.py:93-102). Requires ``huggingface_hub`` and network
    access; raises a clear error when either is unavailable."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise ImportError(
            "download_data_hf needs the 'huggingface_hub' package "
            "(pip install huggingface_hub)") from e
    path = hf_hub_download(repo_id=repo_id, filename=filename,
                           repo_type="dataset", local_dir=local_dir)
    print(f"File has been downloaded and is located at {path}")
    return path
