"""Released-checkpoint loading: full .ckpt container (UniVTG layout) and
CLIP .pt state dicts through the public loader APIs."""
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from univtg_tpu.interop import load_torch_checkpoint  # noqa: E402
from univtg_tpu.interop.clip_ckpt import load_clip_checkpoint  # noqa: E402
from univtg_tpu.models import UniVTG  # noqa: E402

from tests.test_model_parity import CFG, build_ref_model  # noqa: E402


def test_load_released_ckpt_layout(tmp_path):
    """torch.save({'model': sd, 'opt': ..., 'epoch': ...}) with DDP prefixes
    (the reference's checkpoint container, main/train_mr.py:149-187)."""
    ref = build_ref_model(CFG)
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    path = tmp_path / "model_best.ckpt"
    torch.save({"model": sd, "epoch": 42, "opt": {"lr": 1e-4}}, path)

    params = load_torch_checkpoint(str(path), CFG)
    model = UniVTG(CFG)
    rng = np.random.default_rng(0)
    vid = rng.standard_normal((1, 24, CFG.vid_dim)).astype(np.float32)
    txt = rng.standard_normal((1, 10, CFG.txt_dim)).astype(np.float32)
    vm = np.ones((1, 24), np.float32)
    tm = np.ones((1, 10), np.float32)
    out = model.apply(params, txt, tm, vid, vm, train=False)
    with torch.no_grad():
        want = ref(
            src_txt=torch.from_numpy(txt),
            src_txt_mask=torch.from_numpy(tm),
            src_vid=torch.from_numpy(vid),
            src_vid_mask=torch.from_numpy(vm),
        )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), want["pred_logits"].numpy(), atol=1e-4
    )


def test_load_clip_pt(tmp_path):
    sys.path.insert(0, "/root/reference/run_on_video")
    from tests.test_clip_extract import SMALL  # noqa: E402
    from clip.model import CLIP as RefCLIP  # noqa: E402

    torch.manual_seed(0)
    ref = RefCLIP(**SMALL).float().eval()
    path = tmp_path / "clip.pt"
    torch.save(ref.state_dict(), path)

    params, cfg = load_clip_checkpoint(str(path))
    assert cfg.vision_width == SMALL["vision_width"]
    assert cfg.image_resolution == SMALL["image_resolution"]
    from univtg_tpu.extract.clip.model import CLIP

    model = CLIP(cfg)
    imgs = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply(params, imgs, method=CLIP.encode_image))
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_clip_load_by_name_with_mocked_download(tmp_path, monkeypatch):
    """extract.clip.load: name -> download (mocked opener) -> sha256 check
    -> cache reuse -> converted flax params. The reference's clip.load
    download path (run_on_video/clip/clip.py:26-57) without network."""
    import hashlib
    import io

    sys.path.insert(0, "/root/reference/run_on_video")
    from tests.test_clip_extract import SMALL  # noqa: E402
    from clip.model import CLIP as RefCLIP  # noqa: E402

    from univtg_tpu.extract.clip import load as clip_load

    torch.manual_seed(1)
    ref = RefCLIP(**SMALL).float().eval()
    blob_path = tmp_path / "fixture.pt"
    torch.save(ref.state_dict(), blob_path)
    blob = open(blob_path, "rb").read()
    sha = hashlib.sha256(blob).hexdigest()

    calls = []

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_opener(url):
        calls.append(url)
        return FakeResponse(blob)

    monkeypatch.setitem(
        clip_load.MODEL_URLS, "Tiny-Test", f"https://example.invalid/{sha}/Tiny-Test.pt"
    )
    root = str(tmp_path / "cache")
    params, cfg = clip_load.load("Tiny-Test", root=root, opener=fake_opener)
    assert cfg.vision_width == SMALL["vision_width"]
    assert len(calls) == 1
    # second load hits the verified cache, no download
    clip_load.load("Tiny-Test", root=root, opener=fake_opener)
    assert len(calls) == 1
    # corrupt the cached file -> re-download
    cached = clip_load.download_weights("Tiny-Test", root, opener=fake_opener)
    with open(cached, "ab") as f:
        f.write(b"junk")
    clip_load.load("Tiny-Test", root=root, opener=fake_opener)
    assert len(calls) == 2

    # checksum mismatch on a fresh download raises
    def bad_opener(url):
        return FakeResponse(b"not the weights")

    monkeypatch.setitem(
        clip_load.MODEL_URLS, "Bad-Test", f"https://example.invalid/{sha}/Bad.pt"
    )
    with pytest.raises(RuntimeError, match="sha256"):
        clip_load.download_weights("Bad-Test", str(tmp_path / "cache2"), opener=bad_opener)

    # local path bypasses the name table entirely
    params2, cfg2 = clip_load.load(str(blob_path))
    assert cfg2.embed_dim == cfg.embed_dim

    # unknown names fail fast with the catalogue
    with pytest.raises(KeyError):
        clip_load.download_weights("No-Such-Model", root)
    assert "ViT-B/32" in clip_load.available_models()


def test_clip_load_missing_local_path_raises_file_not_found(tmp_path):
    from univtg_tpu.extract.clip import load as clip_load

    with pytest.raises(FileNotFoundError, match="no such checkpoint"):
        clip_load.load(str(tmp_path / "typo" / "ViT-B-16.pt"))
