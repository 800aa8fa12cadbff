"""Released-run reproduction harness: a reference-format checkpoint DIRECTORY
(torch.save container with DDP 'module.' prefixes + saved opt.json with the
reference's flag names) loads through load_reference_run with the architecture
reconstructed from opt.json (main/config.py:233-247, 362-374), and
scripts/reproduce_model_md.py runs end-to-end over it."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_model_parity import CFG, build_ref_model  # noqa: E402
from univtg_tpu.interop import config_from_reference_opt, load_reference_run  # noqa: E402
from univtg_tpu.models import UniVTG  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reference_opt(cfg):
    """opt.json exactly as BaseOptions serializes it (reference flag names;
    v_feat_dim already TEF-bumped at parse time, config.py:287-292)."""
    return {
        "dset_name": "qvhighlights",
        "model_id": "univtg",
        "v_feat_dim": cfg.vid_dim,
        "t_feat_dim": cfg.txt_dim,
        "hidden_dim": cfg.hidden_dim,
        "enc_layers": cfg.num_layers,
        "nheads": cfg.num_heads,
        "dim_feedforward": cfg.ffn_dim,
        "dropout": cfg.dropout,
        "droppath": cfg.droppath,
        "input_dropout": cfg.input_dropout,
        "n_input_proj": cfg.n_input_proj,
        "span_loss_type": cfg.span_loss_type,
        "max_q_l": cfg.max_q_l,
        "max_v_l": cfg.max_v_l,
        "use_txt_pos": False,
        "ctx_mode": "video_tef",
        "clip_length": 2.0,
        "lr": 0.0001,
        "eval_mode": "add",
    }


@pytest.fixture(scope="module")
def released_run(tmp_path_factory):
    """A fake 'released' run dir: model_best.ckpt + opt.json."""
    run_dir = tmp_path_factory.mktemp("released")
    ref = build_ref_model(CFG)
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    ckpt = str(run_dir / "model_best.ckpt")
    torch.save(
        {"model": sd, "optimizer": {}, "lr_scheduler": {}, "epoch": 99,
         "opt": reference_opt(CFG)},
        ckpt,
    )
    json.dump(reference_opt(CFG), open(run_dir / "opt.json", "w"))
    return ckpt, ref


def test_load_reference_run_reconstructs_config(released_run):
    ckpt, ref = released_run
    cfg, params = load_reference_run(ckpt)
    assert (cfg.vid_dim, cfg.txt_dim) == (CFG.vid_dim, CFG.txt_dim)
    assert (cfg.hidden_dim, cfg.num_layers, cfg.num_heads) == (
        CFG.hidden_dim, CFG.num_layers, CFG.num_heads,
    )

    model = UniVTG(cfg)
    rng = np.random.default_rng(1)
    vid = rng.standard_normal((2, 24, cfg.vid_dim)).astype(np.float32)
    txt = rng.standard_normal((2, 10, cfg.txt_dim)).astype(np.float32)
    vm, tm = np.ones((2, 24), np.float32), np.ones((2, 10), np.float32)
    out = model.apply(params, txt, tm, vid, vm, train=False)
    ref.eval()
    with torch.no_grad():
        want = ref(
            src_txt=torch.from_numpy(txt), src_txt_mask=torch.from_numpy(tm),
            src_vid=torch.from_numpy(vid), src_vid_mask=torch.from_numpy(vm),
        )
    np.testing.assert_allclose(
        np.asarray(out["pred_spans"]), want["pred_spans"].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"]), want["saliency_scores"].numpy(), atol=1e-4
    )


def test_load_reference_run_opt_fallbacks(released_run, tmp_path):
    ckpt, _ = released_run
    # explicit opt_json_path
    cfg, _ = load_reference_run(ckpt, os.path.join(os.path.dirname(ckpt), "opt.json"))
    assert cfg.hidden_dim == CFG.hidden_dim
    # no opt.json anywhere, no opt in blob -> actionable error
    bare = str(tmp_path / "bare.ckpt")
    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    torch.save({"model": blob["model"]}, bare)
    with pytest.raises(FileNotFoundError, match="opt.json"):
        load_reference_run(bare)
    # in-ckpt opt dict fallback (opt.json absent next to this copy)
    with_opt = str(tmp_path / "with_opt.ckpt")
    torch.save({"model": blob["model"], "opt": reference_opt(CFG)}, with_opt)
    cfg2, _ = load_reference_run(with_opt)
    assert cfg2.ffn_dim == CFG.ffn_dim


def test_config_from_reference_opt_defaults():
    cfg = config_from_reference_opt({"v_feat_dim": 100, "t_feat_dim": 50})
    assert (cfg.vid_dim, cfg.txt_dim) == (100, 50)
    assert cfg.hidden_dim == 256 and cfg.num_layers == 4  # reference defaults


@pytest.mark.slow
def test_reproduce_script_end_to_end(released_run, tmp_path):
    """The model.md reproduction harness runs start-to-finish (random weights
    here — real numbers need the released checkpoint, but the pipeline must
    work today)."""
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus

    ckpt, _ = released_run
    corpus = create_synthetic_mr_corpus(
        str(tmp_path / "c"),
        n_train=4,
        n_val=8,
        v_dim=CFG.vid_dim - 2,  # pre-TEF
        q_dim=CFG.txt_dim,
        max_clips=24,
        seed=13,
    )
    out = str(tmp_path / "metrics.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "reproduce_model_md.py"),
            "--resume", ckpt,
            "--eval-path", corpus["val_path"],
            "--v-feat-dirs", corpus["v_feat_dirs"][0],
            "--q-feat-dir", corpus["q_feat_dir"],
            "--eval-bsz", "8",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    brief = json.load(open(out))["brief"]
    assert "MR-full-mAP-key" in brief
    assert "model.md expects 45.44" in proc.stdout
