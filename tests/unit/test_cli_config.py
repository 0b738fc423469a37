"""CLI config resolution: overrides, saved-workdir precedence, value parsing."""

from types import SimpleNamespace

from cloudvectordb_tpu.cli import _load_cfg, _parse_value
from cloudvectordb_tpu.utils.config import PipelineConfig


def _args(**kw):
    base = dict(config=None, workdir=None, set=None)
    base.update(kw)
    return SimpleNamespace(**base)


def test_parse_value_types():
    assert _parse_value("3") == 3
    assert _parse_value("0.5") == 0.5
    assert _parse_value("true") is True
    assert _parse_value('"ivf_pq"') == "ivf_pq"
    assert _parse_value("plaintext") == "plaintext"


def test_overrides_applied(tmp_path):
    args = _args(workdir=str(tmp_path / "w"),
                 set=["index.nlist=32", 'index.kind="flat"', "train.lr=0.01"])
    cfg = _load_cfg(args)
    assert cfg.index.nlist == 32
    assert cfg.index.kind == "flat"
    assert cfg.train.lr == 0.01
    assert cfg.workdir == str(tmp_path / "w")


def test_saved_workdir_config_is_source_of_truth(tmp_path):
    wd = tmp_path / "run"
    wd.mkdir()
    saved = PipelineConfig(workdir=str(wd))
    saved.index.nlist = 77
    saved.train.ckpt_dir = str(wd / "ckpt")
    saved.save(wd / "pipeline_config.json")
    cfg = _load_cfg(_args(workdir=str(wd)))
    assert cfg.index.nlist == 77
    assert cfg.train.ckpt_dir == str(wd / "ckpt")
    # explicit --config beats the saved one
    other = tmp_path / "other.json"
    c2 = PipelineConfig()
    c2.index.nlist = 11
    c2.save(other)
    cfg2 = _load_cfg(_args(config=str(other), workdir=str(wd)))
    assert cfg2.index.nlist == 11


def test_unknown_override_rejected(tmp_path):
    import pytest

    with pytest.raises(KeyError):
        _load_cfg(_args(workdir=str(tmp_path / "w"), set=["index.bogus=1"]))


def test_config_roundtrip_preserves_tuple_stages(tmp_path):
    cfg = PipelineConfig(stages=("encode", "build"))
    p = tmp_path / "c.json"
    cfg.save(p)
    cfg2 = PipelineConfig.load(p)
    assert tuple(cfg2.stages) == ("encode", "build")
