"""Async checkpointing: background-write equivalence with the sync path,
write ordering, atomic temp+rename, and writer-error propagation."""
import os

import jax
import numpy as np
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.train import checkpoint as ckpt
from univtg_tpu.train.steps import init_state, make_optimizer

CFG = ModelConfig(
    vid_dim=18, txt_dim=8, hidden_dim=16, num_layers=1, num_heads=2,
    ffn_dim=24, max_v_l=8, max_q_l=4,
)


def _state(seed=0):
    model = UniVTG(CFG)
    return init_state(model, CFG, make_optimizer(lambda s: 1e-3), jax.random.PRNGKey(seed))


def test_async_save_equals_sync_save(tmp_path):
    state = _state()
    sync_path = str(tmp_path / "sync.ckpt")
    async_path = str(tmp_path / "async.ckpt")
    ckpt.save_checkpoint(sync_path, state, epoch=3, config_json='{"a": 1}')

    saver = ckpt.AsyncCheckpointer()
    saver.save(async_path, state, epoch=3, config_json='{"a": 1}')
    saver.wait()

    with open(sync_path, "rb") as f1, open(async_path, "rb") as f2:
        assert f1.read() == f2.read()
    assert (tmp_path / "opt.json").read_text() == '{"a": 1}'
    assert not os.path.exists(async_path + ".tmp")  # atomic rename, no debris

    restored, epoch = ckpt.restore_checkpoint(async_path, _state(seed=1))
    assert epoch == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_ordering_latest_then_best(tmp_path):
    """Back-to-back saves (the latest -> best sequence within an eval epoch)
    serialize in order; the second save joins the first before starting."""
    s0, s1 = _state(seed=0), _state(seed=2)
    latest, best = str(tmp_path / "latest.ckpt"), str(tmp_path / "best.ckpt")
    saver = ckpt.AsyncCheckpointer()
    saver.save(latest, s0, epoch=0)
    saver.save(best, s1, epoch=0)  # must not interleave with the first write
    saver.wait()

    r_latest, _ = ckpt.restore_checkpoint(latest, _state(seed=9))
    r_best, _ = ckpt.restore_checkpoint(best, _state(seed=9))
    a = jax.tree_util.tree_leaves(s0.params)[0]
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(jax.tree_util.tree_leaves(r_latest.params)[0])
    )
    b = jax.tree_util.tree_leaves(s1.params)[0]
    np.testing.assert_array_equal(
        np.asarray(b), np.asarray(jax.tree_util.tree_leaves(r_best.params)[0])
    )


def test_async_writer_error_surfaces(tmp_path):
    ro_dir = tmp_path / "ro"
    ro_dir.mkdir()
    os.chmod(ro_dir, 0o500)
    if os.access(str(ro_dir / "x"), os.W_OK) or os.geteuid() == 0:
        pytest.skip("running as root: read-only dirs are still writable")
    saver = ckpt.AsyncCheckpointer()
    saver.save(str(ro_dir / "model.ckpt"), _state(), epoch=0)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        saver.wait()


def test_sync_save_is_atomic(tmp_path):
    """A pre-existing checkpoint is replaced atomically: the temp file never
    survives, and an interrupted write cannot truncate the original (we
    assert the rename discipline: content changes only via os.replace)."""
    path = str(tmp_path / "model_latest.ckpt")
    ckpt.save_checkpoint(path, _state(seed=0), epoch=0)
    before = os.path.getsize(path)
    ckpt.save_checkpoint(path, _state(seed=1), epoch=1)
    assert os.path.getsize(path) == before  # same tree, full rewrite
    assert not os.path.exists(path + ".tmp")
    _, epoch = ckpt.restore_checkpoint(path, _state(seed=3))
    assert epoch == 1
