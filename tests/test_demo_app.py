"""Demo app executed end-to-end: the gradio Blocks wiring is driven through a
stub gradio module, and the extract -> ground callbacks run over the real
bundled charades.mp4 through the cv2 decoder + tiny CLIP towers + grounding
pipeline (the reference's main_gradio.py:82-238 flow)."""
import os
from contextlib import contextmanager
from types import SimpleNamespace

import numpy as np
import pytest

VIDEO = "/root/reference/examples/charades.mp4"


# ---------------------------------------------------------------- stub gradio
class _Component:
    def __init__(self, **kw):
        self.kw = kw
        self.value = kw.get("value")

    def click(self, fn, inputs=None, outputs=None):
        _WIRED.append((self.kw.get("label", "?"), fn, inputs, outputs))


class _Blocks:
    def __init__(self, **kw):
        self.kw = kw
        self.launched = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def launch(self, **kw):
        self.launched = kw


@contextmanager
def _container(**kw):
    yield


_WIRED = []


def make_stub_gradio():
    _WIRED.clear()
    return SimpleNamespace(
        Blocks=_Blocks,
        Row=_container,
        Column=_container,
        Markdown=lambda *a, **k: _Component(),
        Video=_Component,
        Button=lambda label=None, **k: _Component(label=label, **k),
        Textbox=_Component,
    )


# ---------------------------------------------------------------- pipeline
@pytest.fixture(scope="module")
def pipeline():
    import jax

    from univtg_tpu.extract.clip.model import CLIP, CLIPConfig
    from univtg_tpu.extract.pipeline import ClipEncoder
    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.serve import GroundingPipeline

    clip_cfg = CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=2, vision_width=64,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=4, transformer_layers=2,
    )
    clip_model = CLIP(clip_cfg)
    clip_params = clip_model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 77), np.int32),
    )
    enc = ClipEncoder(clip_params, clip_cfg, image_batch=8, text_batch=2)

    g_cfg = ModelConfig(
        vid_dim=514, txt_dim=64, hidden_dim=64, num_layers=1, num_heads=4,
        ffn_dim=64, max_v_l=75, max_q_l=32,
    )
    g_model = UniVTG(g_cfg)
    g_params = g_model.init(
        jax.random.PRNGKey(1),
        np.zeros((1, 8, 64), np.float32),
        np.ones((1, 8), np.float32),
        np.zeros((1, 16, 514), np.float32),
        np.ones((1, 16), np.float32),
        train=False,
    )["params"]
    return GroundingPipeline(
        g_cfg, g_params, clip_len=2.0, buckets=[16, 32], clip_encoder=enc
    )


@pytest.mark.skipif(not os.path.exists(VIDEO), reason="no example video")
def test_app_extract_then_ground_end_to_end(pipeline):
    from univtg_tpu.serve.app import launch_app

    gr = make_stub_gradio()
    demo = launch_app(pipeline, server_port=1234, gr=gr)
    assert demo.launched == {"server_port": 1234, "share": False}
    assert [w[0] for w in _WIRED] == ["Extract features", "Ground"]
    extract = _WIRED[0][1]
    ground = _WIRED[1][1]

    # guard: grounding before extraction
    assert ground("person opens a door") == "Extract a video first."
    # guard: empty video path
    assert extract("") == "Upload a video first."

    status = extract(VIDEO)
    assert "Extracted" in status and "clip features" in status

    answer = ground("person opens a door")
    assert "For query: person opens a door" in answer
    assert "The Top-1 interval is:" in answer
    assert "Top-5 windows:" in answer
    assert answer.count("conf") == 5
    # window timestamps are within the ~31s video
    import re

    times = [float(x) for x in re.findall(r"\[\s*([\d.]+)s", answer)]
    assert all(0 <= t <= 40 for t in times)


def test_app_youtube_id_path(pipeline, monkeypatch, tmp_path):
    """A bare YouTube id routes through the yt-dlp download helper."""
    import univtg_tpu.serve.app as app

    calls = {}

    def fake_download(vid, save_path, size=768):
        calls["vid"] = vid
        # point at the real local file so extraction proceeds
        return VIDEO

    monkeypatch.setattr(app, "download_video", fake_download)
    extract, _ = app.build_callbacks(pipeline)
    if not os.path.exists(VIDEO):
        pytest.skip("no example video")
    status = extract("G7zJK6lcbyU", workdir=str(tmp_path))
    assert calls["vid"] == "G7zJK6lcbyU"
    assert "Extracted" in status


def test_download_video_errors(monkeypatch, tmp_path):
    from univtg_tpu.serve.app import download_video

    def missing(*a, **kw):
        raise FileNotFoundError("no yt-dlp")

    monkeypatch.setattr("subprocess.run", missing)
    with pytest.raises(FileNotFoundError, match="yt-dlp is not installed"):
        download_video("abc123", str(tmp_path / "v.mp4"))

    def fails(cmd, **kw):
        assert cmd[0] == "yt-dlp"
        assert cmd[-1] == "https://www.youtube.com/watch?v=abc123"
        return SimpleNamespace(returncode=1, stderr="HTTP 403")

    monkeypatch.setattr("subprocess.run", fails)
    with pytest.raises(RuntimeError, match="yt-dlp failed"):
        download_video("abc123", str(tmp_path / "v.mp4"))


def test_launch_app_without_gradio(pipeline):
    """Missing gradio must raise the actionable ImportError."""
    import builtins

    from univtg_tpu.serve.app import launch_app

    real_import = builtins.__import__

    def block_gradio(name, *a, **kw):
        if name == "gradio":
            raise ImportError("No module named 'gradio'")
        return real_import(name, *a, **kw)

    builtins.__import__ = block_gradio
    try:
        with pytest.raises(ImportError, match="cli ground"):
            launch_app(pipeline)
    finally:
        builtins.__import__ = real_import
