"""PyTorch checkpoint -> JAX pytree weight converter.

Loads the reference's released ``.pth`` state dicts (keys documented in
SURVEY §2; saved by scripts/trainer_no_adv.py:152-162) into this
framework's flax variable tree. Name mapping is mechanical:

  flax path                      torch key
  ---------                      ---------
  encoder/blocks_0/swint_blocks_1/attn/qkv/kernel
                              -> encoder.blocks.0.swint_blocks.1.attn.qkv.weight (T)
  quantizers_2/vqs_1/embedding -> quantizers.2.vqs.1.embedding.weight
  .../subsample/down/kernel    -> ....subsample.down.weight (T)
  patch_embed/proj/kernel      -> patch_embed.proj.weight (OIHW -> HWIO)
  batch_stats .../mean         -> ....running_mean

Transforms: Linear kernels transpose; conv kernels OIHW->HWIO (the same
permutation also maps torch ConvTranspose2d IOHW weights onto flax
ConvTranspose(transpose_kernel=True) HWOI kernels); LayerNorm/BatchNorm
``scale`` is torch ``weight``; everything else copies through.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["torch_to_flax", "load_torch_checkpoint", "flax_to_torch"]

_LIST_COMPONENT = re.compile(r"^(.*)_(\d+)$")
# flax submodule names that are list entries in the torch module tree
_LIST_NAMES = {"blocks", "swint_blocks", "quantizers", "vqs", "down_projs",
               "up_projs", "block", "model", "discriminators", "convs",
               "band_convs"}


# auto-generated flax child names inside nn.WeightNorm wrappers
_WN_INNER = {"Conv_0", "ConvTranspose_0", "Dense_0"}


def _flax_path_to_torch_key(path) -> str:
    """('encoder','blocks_0','attn','qkv','kernel') ->
    'encoder.blocks.0.attn.qkv.weight'.

    Weight-norm layers map onto torch's split parametrization:
      .../Conv_0/kernel                  -> <parent>.weight_v
      .../<wn-name>/Conv_0/kernel/scale  -> <parent>.weight_g
    where <parent> is the path with the WeightNorm bookkeeping components
    removed (torch applies weight_norm to the conv module itself).
    """
    raw = [p.key if hasattr(p, "key") else str(p) for p in path]

    is_wn = any(r in _WN_INNER for r in raw)
    # flax WeightNorm names the scale param '<Inner>_0/kernel/scale' (one
    # component with slashes), living under the wrapper's name
    is_wn_scale = raw[-1].endswith("/scale")

    if is_wn_scale:
        raw = raw[:-2]  # drop wrapper name + the scale component
        raw.append("weight_g")

    parts = []
    for name in raw:
        if name in _WN_INNER:
            continue
        # Strip trailing _<idx> components (possibly several: flax
        # 'band_convs_0_1' is torch 'band_convs.0.1') when the base name
        # is a known torch ModuleList.
        idxs = []
        base = name
        while True:
            m = _LIST_COMPONENT.match(base)
            if not m:
                break
            idxs.append(m.group(2))
            base = m.group(1)
        if idxs and base in _LIST_NAMES:
            parts.append(base)
            parts.extend(reversed(idxs))
        else:
            parts.append(name)

    if is_wn_scale:
        return ".".join(parts)

    leaf = parts.pop()
    if is_wn and leaf == "kernel":
        leaf_name = "weight_v"
    else:
        leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var",
                    "embedding": "embedding.weight",
                    "codebook": "codebook.weight",
                    "alpha": "alpha",
                    "relative_position_bias_table":
                        "relative_position_bias_table",
                    "weight": "weight"}
        leaf_name = leaf_map.get(leaf, leaf)
    parts.append(leaf_name)
    return ".".join(parts)


def _to_flax_array(torch_value, flax_leaf: np.ndarray, torch_key: str):
    v = np.asarray(torch_value, dtype=np.float32)
    if torch_key.endswith("weight_g"):
        v = v.reshape(-1)  # (out, 1, 1) -> (out,) WeightNorm scale
    elif torch_key.endswith("alpha"):
        v = v.reshape(flax_leaf.shape)  # snake (1, C, 1) -> (1, 1, C)
    elif v.ndim == 2 and flax_leaf.ndim == 2 \
            and (torch_key.endswith("weight")
                 or torch_key.endswith("weight_v")) \
            and "embedding" not in torch_key \
            and "codebook" not in torch_key \
            and "relative_position_bias_table" not in torch_key:
        v = v.T  # torch Linear (out, in) -> flax kernel (in, out)
    elif v.ndim == 3 and flax_leaf.ndim == 3:
        v = v.transpose(2, 1, 0)  # Conv1d OIW -> WIO (and IOW -> WOI)
    elif v.ndim == 4 and flax_leaf.ndim == 4:
        v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO (and IOHW -> HWOI)
    if v.shape != flax_leaf.shape:
        raise ValueError(
            f"shape mismatch for {torch_key}: torch {v.shape} vs flax "
            f"{flax_leaf.shape}")
    return v.astype(flax_leaf.dtype)


def torch_to_flax(state_dict: Dict[str, Any], variables: Dict[str, Any],
                  strict: bool = True) -> Dict[str, Any]:
    """Map a torch ``state_dict`` onto an initialized flax variable tree.

    ``variables`` provides the target structure/shapes (from
    ``model.init_params()``); returns a new tree with converted weights.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v))
          for k, v in state_dict.items()}
    used = set()

    def convert_collection(coll_name, tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        leaves, treedef = flat
        out = []
        for path, leaf in leaves:
            key = _flax_path_to_torch_key(path)
            if key not in sd:
                # DAC-style WN convs live inside Sequential(conv, leaky):
                # torch names them '<parent>.0.weight_v' etc.
                head, _, leaf2 = key.rpartition(".")
                alt = f"{head}.0.{leaf2}"
                if head and alt in sd:
                    key = alt
            if key not in sd:
                if strict:
                    raise KeyError(
                        f"torch checkpoint missing {key} "
                        f"(for flax {coll_name} leaf)")
                out.append(leaf)
                continue
            used.add(key)
            out.append(_to_flax_array(sd[key], np.asarray(leaf), key))
        return jax.tree_util.tree_unflatten(treedef, out)

    new_vars = {}
    for coll, tree in variables.items():
        new_vars[coll] = convert_collection(coll, tree)

    if strict:
        # ignore reference buffers that have no learnable counterpart
        ignorable = ("relative_position_index", "ft.", "ift.",
                     "num_batches_tracked", "mel_transf")
        missing = [k for k in sd if k not in used
                   and not any(t in k for t in ignorable)]
        if missing:
            raise KeyError(f"unconsumed torch keys: {missing[:8]}"
                           f"{'...' if len(missing) > 8 else ''}")
    return new_vars


def flax_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> a torch-layout state dict
    (numpy values), for interop with reference tooling."""
    out: Dict[str, np.ndarray] = {}
    for coll, tree in variables.items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = _flax_path_to_torch_key(path)
            v = np.asarray(leaf)
            leaf_name = path[-1].key if hasattr(path[-1], "key") else ""
            if v.ndim == 2 and leaf_name == "kernel":
                v = v.T
            elif v.ndim == 4 and leaf_name == "kernel":
                v = v.transpose(3, 2, 0, 1)
            out[key] = v
    return out


def load_torch_checkpoint(path: str, model, strict: bool = True):
    """Load a reference ``.pth`` checkpoint file into a codec wrapper.

    Reads ``model_state_dict`` (the reference's key,
    scripts/trainer_no_adv.py:155) or a bare state dict.
    """
    import torch
    ckp = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckp.get("model_state_dict", ckp) if isinstance(ckp, dict) else ckp
    model._ensure_init()
    model.variables = torch_to_flax(sd, model.variables, strict=strict)
    return model


def _main():
    """CLI: convert a reference .pth checkpoint to a native .ckpt.

        python -m esc_tpu.convert <model_dir_with_config.yaml_and_.pth> \
            [output.ckpt]
    """
    import argparse
    import os

    from .checkpoint import save_checkpoint
    from .models import make_model
    from .utils import read_yaml

    p = argparse.ArgumentParser(prog="esc_tpu.convert")
    p.add_argument("model_path", help="folder with config.yaml + model.pth")
    p.add_argument("output", nargs="?", default=None,
                   help="output .ckpt path (default: model.ckpt alongside)")
    args = p.parse_args()

    cfg = read_yaml(os.path.join(args.model_path, "config.yaml"))
    model = make_model(cfg["model"], cfg.get("model_name", "csvq+swinT"))
    model.init_params()
    pth = next(os.path.join(args.model_path, c)
               for c in ("model.pth", "best.pth", "checkpoint.pth")
               if os.path.exists(os.path.join(args.model_path, c)))
    load_torch_checkpoint(pth, model)
    out = args.output or os.path.join(args.model_path, "model.ckpt")
    save_checkpoint(os.path.dirname(out) or ".", os.path.basename(out),
                    step=0, model_state=model.variables["params"])
    print(f"converted {pth} -> {out}")


if __name__ == "__main__":
    _main()
