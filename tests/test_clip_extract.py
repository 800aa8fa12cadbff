"""CLIP extraction stack: tokenizer + tower parity vs the reference vendored
CLIP (CPU, random weights), batched pipeline behavior."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference tokenizer imports ftfy (absent here); identity-stub it --
# test strings are clean ASCII where ftfy is a no-op
if "ftfy" not in sys.modules:
    stub = types.ModuleType("ftfy")
    stub.fix_text = lambda s: s
    sys.modules["ftfy"] = stub
if "torchvision" not in sys.modules:  # clip/__init__ imports clip.clip -> torchvision
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
        setattr(tr, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr

sys.path.insert(0, "/root/reference/run_on_video")

from clip.model import CLIP as RefCLIP  # noqa: E402
from clip.simple_tokenizer import SimpleTokenizer as RefTokenizer  # noqa: E402

import jax  # noqa: E402

from univtg_tpu.extract.clip.model import CLIP, CLIPConfig  # noqa: E402
from univtg_tpu.extract.clip.tokenizer import get_tokenizer, tokenize  # noqa: E402
from univtg_tpu.interop.clip_ckpt import (  # noqa: E402
    clip_params_from_torch_state_dict,
    config_from_state_dict,
)

TEXTS = [
    "a man is walking his dog in the park",
    "Chef makes pizza and cuts it up.",
    "POV cooking: frying eggs, 100% tasty!",
    "some   extra   spaces &amp; entities",
]


def test_tokenizer_matches_reference():
    ref = RefTokenizer()
    mine = get_tokenizer()
    for t in TEXTS:
        assert mine.encode(t) == ref.encode(t), t


def test_tokenize_framing_matches_reference():
    # run_on_video/clip/clip.py:186-194 framing (clip.py itself needs
    # torchvision, so the framing is replicated around the ref tokenizer)
    ref = RefTokenizer()
    sot, eot = ref.encoder["<|startoftext|>"], ref.encoder["<|endoftext|>"]
    want = np.zeros((len(TEXTS), 77), np.int32)
    for i, t in enumerate(TEXTS):
        row = [sot] + ref.encode(t)[: 32 - 2] + [eot]
        want[i, : len(row)] = row
    got = tokenize(TEXTS, context_length=77, max_valid_length=32)
    np.testing.assert_array_equal(got, want)


SMALL = dict(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=8,
    context_length=20,
    vocab_size=120,
    transformer_width=48,
    transformer_heads=4,
    transformer_layers=2,
)


@pytest.fixture(scope="module")
def towers():
    torch.manual_seed(0)
    ref = RefCLIP(**SMALL).float().eval()
    sd = ref.state_dict()
    cfg = CLIPConfig(
        **{k: SMALL[k] for k in SMALL},
    )
    inferred = config_from_state_dict(sd)
    assert inferred.vision_width == cfg.vision_width
    assert inferred.transformer_layers == cfg.transformer_layers
    params = clip_params_from_torch_state_dict(sd, cfg)
    return ref, CLIP(cfg), params, cfg


def test_image_tower_parity(towers):
    ref, model, params, cfg = towers
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, imgs, method=CLIP.encode_image))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_text_tower_parity(towers):
    ref, model, params, cfg = towers
    rng = np.random.default_rng(1)
    tokens = np.zeros((2, cfg.context_length), np.int64)
    for i in range(2):
        n = int(rng.integers(3, cfg.context_length))
        tokens[i, :n] = rng.integers(1, cfg.vocab_size - 1, n)
        tokens[i, n - 1] = cfg.vocab_size - 1  # EOT = argmax
    with torch.no_grad():
        want = ref.encode_text(torch.from_numpy(tokens))
    got = model.apply(params, tokens.astype(np.int32), method=CLIP.encode_text)
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want["last_hidden_state"].numpy(),
        atol=2e-4,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]),
        want["pooler_output"].numpy(),
        atol=2e-4,
        rtol=1e-3,
    )


def test_batched_encoder_padding(towers):
    from univtg_tpu.extract.pipeline import ClipEncoder

    _, model, params, cfg = towers
    enc = ClipEncoder(params, cfg, image_batch=4, text_batch=2)
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((6, 32, 32, 3)).astype(np.float32)
    feats = enc.encode_images(frames)
    assert feats.shape == (6, cfg.embed_dim)
    # padded batch must not change results of real rows
    feats2 = enc.encode_images(frames[:4])
    np.testing.assert_allclose(feats[:4], feats2, atol=1e-5)


def test_uint8_frames_normalized_on_device(towers):
    """uint8 frames (4x cheaper transfer) produce the same features as the
    host-normalized float32 path."""
    from univtg_tpu.extract.pipeline import ClipEncoder
    from univtg_tpu.extract.video import preprocess_frames

    _, model, params, cfg = towers
    enc = ClipEncoder(params, cfg, image_batch=4, text_batch=2)
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    feats_u8 = enc.encode_images(raw)
    feats_f32 = enc.encode_images(preprocess_frames(raw))
    assert feats_u8.shape == (5, cfg.embed_dim)
    np.testing.assert_allclose(feats_u8, feats_f32, atol=1e-4, rtol=1e-4)
