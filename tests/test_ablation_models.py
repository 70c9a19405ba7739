"""Ablation model families: rvq+swinT, csvq+conv, rvq+conv (the
reference's model_dict, esc/models/codecs.py:183-188) — end-to-end
encode/decode/forward on tiny configs.
"""

import numpy as np
import pytest

from esc_tpu.models import make_model

L = 7920  # T=100 frames -> tokens (64, 50)

TINY = dict(
    in_dim=2, in_freq=192, h_dims=[8, 8, 8, 12, 12, 16], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    overlap=2, group_size=3, codebook_size=32, l2norm=True,
)
SWIN = dict(swin_heads=[2, 2, 2, 2, 2], swin_depth=1, window_size=4,
            mlp_ratio=1.0)
CONV = dict(kernel_size=[5, 2], conv_depth=1)


@pytest.mark.parametrize("name,extra", [
    ("rvq+swinT", dict(SWIN, codebook_dim=8, num_rvqs=6)),
    ("csvq+conv", dict(CONV, backbone="convolution", codebook_dims=[8] * 6)),
    ("rvq+conv", dict(CONV, backbone="convolution", codebook_dim=8,
                      num_rvqs=6)),
])
def test_ablation_roundtrip(rng, name, extra):
    cfg = dict(TINY, backbone=extra.pop("backbone", "transformer"), **extra)
    model = make_model(cfg, name)
    model.init_params(example_len=L)
    x = rng.standard_normal((1, L)).astype(np.float32)

    codes, shape = model.encode(x, num_streams=3)
    if name.startswith("rvq"):
        # bottleneck product-RVQ: (B, num_streams, num_pvqs, T)
        assert codes.shape[:2] == (1, 3) and codes.shape[2] == 3
    else:
        assert codes.shape[:3] == (1, 3, 3)
    recon = model.decode(codes, shape)
    assert recon.shape == (1, L)
    assert np.isfinite(np.asarray(recon)).all()


def test_config_normalization_quirks():
    # reference ablation YAMLs mix up codebook_dim / codebook_dims
    # (SURVEY §7 quirks); make_model must normalize both directions.
    cfg = dict(TINY, **SWIN)
    cfg["codebook_dim"] = 8  # wrong key for csvq family
    m = make_model(cfg, "csvq+swinT")
    assert list(m.config["codebook_dims"]) == [8] * 6

    cfg2 = dict(TINY, **SWIN)
    cfg2["codebook_dims"] = [8] * 6  # wrong key for rvq family
    cfg2["num_rvqs"] = 4
    m2 = make_model(cfg2, "rvq+swinT")
    assert m2.config["codebook_dim"] == 8

    with pytest.raises(ValueError):
        make_model(cfg, "nonexistent+model")
