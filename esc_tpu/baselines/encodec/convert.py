"""Released-EnCodec torch state dict -> flax params.

Maps the ``encodec_24khz`` checkpoint layout (facebook/encodec pip
package; the torch comparison wrapper the reference uses lives at
baselines/descript/dac/compare/encodec.py) onto EncodecModule.

flax.linen.WeightNorm keeps direction + scale as separate params, so no
folding happens: torch ``weight_v`` becomes the kernel (transposed to
the flax layout) and ``weight_g`` becomes the WeightNorm scale.

  torch                                     flax (inside layer_{i})
  ----------------------------------------  -------------------------------
  <m>.conv.conv.weight_v   (O,I,K)          Conv_0/kernel          (K,I,O)
  <m>.conv.conv.weight_g   (O,1,1)          conv/Conv_0/kernel/scale   (O,)
  <m>.convtr.convtr.weight_v (I,O,K)        ConvTranspose_0/kernel (K,O,I)
  <m>.convtr.convtr.weight_g (I,1,1)        conv/...kernel/scale       (I,)
  <m>.lstm.weight_ih_l{k}  (4H,Cin)         lstm_{k}/wi          (Cin,4H)
  quantizer.vq.layers.{q}._codebook.embed   quantizer/codebooks[q]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["torch_to_encodec_params", "load_torch_encodec"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _fill_sconv(dst: Dict[str, Any], sd: Dict[str, Any], tprefix: str,
                transposed: bool):
    """Populate one SConv1d / SConvTranspose1d scope in-place."""
    inner = "convtr" if transposed else "conv"
    flax_inner = "ConvTranspose_0" if transposed else "Conv_0"
    v = _np(sd[f"{tprefix}.{inner}.{inner}.weight_v"])
    g = _np(sd[f"{tprefix}.{inner}.{inner}.weight_g"])
    # torch conv (O,I,K) -> flax (K,I,O); torch convT (I,O,K) -> flax
    # transpose_kernel layout (K,O,I): both are a (2,1,0) transpose.
    dst[flax_inner]["kernel"] = np.transpose(v, (2, 1, 0))
    bias_key = f"{tprefix}.{inner}.{inner}.bias"
    if bias_key in sd:
        dst[flax_inner]["bias"] = _np(sd[bias_key])
    dst["conv"][f"{flax_inner}/kernel/scale"] = g.reshape(-1)


def _fill_lstm(dst: Dict[str, Any], sd: Dict[str, Any], tprefix: str):
    for name, sub in dst.items():
        k = int(name.split("_")[-1])
        sub["wi"] = _np(sd[f"{tprefix}.weight_ih_l{k}"]).T
        sub["wh"] = _np(sd[f"{tprefix}.weight_hh_l{k}"]).T
        sub["bi"] = _np(sd[f"{tprefix}.bias_ih_l{k}"])
        sub["bh"] = _np(sd[f"{tprefix}.bias_hh_l{k}"])


def torch_to_encodec_params(sd: Dict[str, Any], module,
                            variables: Dict[str, Any]) -> Dict[str, Any]:
    """Build EncodecModule flax params from a torch state dict; every
    leaf shape is validated against ``variables``."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def fill_side(side: str, tree: Dict[str, Any]):
        for name, sub in tree.items():
            i = int(name.split("_")[-1])
            tprefix = f"{side}.model.{i}"
            if "lstm_0" in sub:                       # SLSTM
                _fill_lstm(sub, sd, f"{tprefix}.lstm")
            elif "shortcut" in sub or "block_0" in sub:  # resnet block
                for bname, bsub in sub.items():
                    if bname == "shortcut":
                        src = f"{tprefix}.shortcut"
                    else:
                        # torch block = [act, conv, act, conv] -> 2j+1
                        j = int(bname.split("_")[-1])
                        src = f"{tprefix}.block.{2 * j + 1}"
                    _fill_sconv(bsub, sd, src, transposed=False)
            else:                                      # plain (T)conv
                transposed = (
                    f"{tprefix}.convtr.convtr.weight_v" in sd)
                _fill_sconv(sub, sd, tprefix, transposed)

    fill_side("encoder", params["encoder"])
    fill_side("decoder", params["decoder"])

    n_q = params["quantizer"]["codebooks"].shape[0]
    params["quantizer"]["codebooks"] = np.stack(
        [_np(sd[f"quantizer.vq.layers.{q}._codebook.embed"])
         for q in range(n_q)], axis=0)

    ref_shapes = {
        jax.tree_util.keystr(p): tuple(l.shape) for p, l in
        jax.tree_util.tree_leaves_with_path(variables["params"])}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        want = ref_shapes.get(key)
        if want is None:
            raise ValueError(f"unexpected param {key}")
        if tuple(leaf.shape) != want:
            raise ValueError(f"{key}: torch {leaf.shape} != flax {want}")
    return {"params": jax.tree_util.tree_map(jnp_asarray, params)}


def jnp_asarray(a):
    import jax.numpy as jnp
    return jnp.asarray(a)


def load_torch_encodec(path: str, module, variables: Dict[str, Any]):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "best_state" in sd:  # release format
        sd = sd["best_state"]
    return torch_to_encodec_params(sd, module, variables)
