"""Config json round-trip: a saved opt.json must reconstruct the full typed
config (the reference's TestOptions contract, main/config.py:233-247)."""
from univtg_tpu.models import ModelConfig
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.presets import qvhighlights_mr
from univtg_tpu.train.config_io import from_json, load_config, save_config, to_json
from univtg_tpu.train.driver_mr import TrainConfig


def test_roundtrip_train_config():
    cfg = qvhighlights_mr(**{"bsz": 16, "model.hidden_dim": 512, "weights.b": 5.0})
    back = from_json(TrainConfig, to_json(cfg))
    assert back == cfg
    assert isinstance(back.model, ModelConfig)
    assert isinstance(back.weights, LossWeights)
    assert back.weights.b == 5.0
    assert back.train_data.v_feat_dirs == cfg.train_data.v_feat_dirs


def test_save_load_with_overrides(tmp_path):
    cfg = qvhighlights_mr()
    save_config(cfg, str(tmp_path))
    back = load_config(TrainConfig, str(tmp_path), overrides={"eval_bsz": 4})
    assert back.eval_bsz == 4
    assert back.model == cfg.model


def test_hl_qfvs_config_roundtrip():
    from univtg_tpu.presets import qfvs, tvsum_hl
    from univtg_tpu.train.driver_hl import HLTrainConfig
    from univtg_tpu.train.driver_qfvs import QFVSTrainConfig

    hl = tvsum_hl()
    assert from_json(HLTrainConfig, to_json(hl)) == hl
    qf = qfvs()
    assert from_json(QFVSTrainConfig, to_json(qf)) == qf


def test_snapshot_code(tmp_path):
    import zipfile

    from univtg_tpu.train.config_io import snapshot_code

    out = snapshot_code(str(tmp_path))
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert any(n.endswith("models/univtg.py") for n in names)
    assert any(n.endswith("native/src/ap_kernel.cpp") for n in names)
