"""ModifiedResNet CLIP tower: forward parity vs the reference implementation
(run_on_video/clip/model.py:60-150) on random weights through the converter,
plus RN-architecture detection from a released-format state_dict."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# clip/__init__ imports clip.clip -> torchvision/ftfy (absent); stub them
# (same recipe as test_clip_extract.py)
if "ftfy" not in sys.modules:
    stub = types.ModuleType("ftfy")
    stub.fix_text = lambda s: s
    sys.modules["ftfy"] = stub
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
        setattr(tr, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
sys.path.insert(0, "/root/reference/run_on_video")

from clip.model import CLIP as RefCLIP  # noqa: E402

from univtg_tpu.extract.clip.model import CLIP, CLIPConfig, rn50  # noqa: E402
from univtg_tpu.interop.clip_ckpt import (  # noqa: E402
    clip_params_from_torch_state_dict,
    config_from_state_dict,
)

TINY = CLIPConfig(
    embed_dim=64,
    image_resolution=64,
    vision_layers=(1, 1, 2, 1),  # stage 3 has 2 blocks: covers the
    vision_width=32,             # non-downsampling bottleneck too
    vision_patch_size=0,
    context_length=77,
    vocab_size=49408,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=2,
)


def build_ref(cfg: CLIPConfig) -> "RefCLIP":
    torch.manual_seed(7)
    ref = RefCLIP(
        embed_dim=cfg.embed_dim,
        image_resolution=cfg.image_resolution,
        vision_layers=tuple(cfg.vision_layers)
        if cfg.is_resnet
        else cfg.vision_layers,
        vision_width=cfg.vision_width,
        vision_patch_size=cfg.vision_patch_size or 32,
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        transformer_width=cfg.transformer_width,
        transformer_heads=cfg.transformer_heads,
        transformer_layers=cfg.transformer_layers,
    )
    ref.float().eval()
    # perturb BN running stats so the parity test exercises them
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return ref


@pytest.fixture(scope="module")
def tiny_pair():
    ref = build_ref(TINY)
    params = clip_params_from_torch_state_dict(ref.state_dict(), TINY)
    return ref, CLIP(TINY), params


def test_resnet_encode_image_parity(tiny_pair):
    ref, model, params = tiny_pair
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    got = model.apply(params, imgs, method=CLIP.encode_image)
    with torch.no_grad():
        want = ref.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    assert got.shape == (3, TINY.embed_dim)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_resnet_full_clip_logits_parity(tiny_pair):
    ref, model, params = tiny_pair
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    toks = np.zeros((2, 77), np.int32)
    toks[0, :5] = [49406, 320, 1125, 539, 49407]
    toks[1, :4] = [49406, 320, 2368, 49407]
    got = model.apply(params, imgs, toks)
    # the reference's own forward() is dead upstream (encode_text returns a
    # dict, model.py:354-365 crashes on .norm) -- recompute its contract
    with torch.no_grad():
        img = ref.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        txt = ref.encode_text(torch.from_numpy(toks.astype(np.int64)))[
            "pooler_output"
        ]
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        logits = ref.logit_scale.exp() * img @ txt.t()
    np.testing.assert_allclose(np.asarray(got), logits.numpy(), atol=2e-4)


def test_rn_architecture_detection(tiny_pair):
    ref, _, _ = tiny_pair
    cfg = config_from_state_dict(ref.state_dict())
    assert cfg.is_resnet
    assert tuple(cfg.vision_layers) == (1, 1, 2, 1)
    assert cfg.vision_width == 32
    assert cfg.image_resolution == 64
    assert cfg.embed_dim == 64
    assert cfg.vision_heads == 16


def test_rn50_config_constants():
    cfg = rn50()
    assert tuple(cfg.vision_layers) == (3, 4, 6, 3)
    assert cfg.embed_dim == 1024
    assert cfg.vision_heads == 32
    assert cfg.is_resnet


def test_resnet_through_clip_encoder(tiny_pair):
    """The extraction pipeline API works with the ResNet tower."""
    from univtg_tpu.extract.pipeline import ClipEncoder

    ref, _, params = tiny_pair
    enc = ClipEncoder(params, TINY, image_batch=4, text_batch=2)
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
    feats = enc.encode_images(frames)
    assert feats.shape == (6, TINY.embed_dim)
    with torch.no_grad():
        want = ref.encode_image(
            torch.from_numpy(frames.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, atol=1e-4)
