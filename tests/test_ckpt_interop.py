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
