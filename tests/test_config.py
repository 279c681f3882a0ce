"""Config system: overlays, overrides, interpolation."""
import os

import pytest

from onepose_tpu.config import load_config


@pytest.fixture
def config_tree(tmp_path):
    (tmp_path / "experiment").mkdir()
    (tmp_path / "config.yaml").write_text(
        "work_dir: ${hydra:runtime.cwd}\n"
        "data_dir: ${work_dir}/data\n"
        "name: base\n")
    (tmp_path / "experiment" / "exp1.yaml").write_text(
        "type: inference\n"
        "model:\n"
        "  path: ${data_dir}/m.ckpt\n"
        "  threshold: 0.2\n"
        "nested:\n"
        "  ref: ${model.threshold}\n")
    return str(tmp_path)


def test_base_and_interpolation(config_tree):
    cfg = load_config([], config_dir=config_tree)
    assert cfg.work_dir == os.getcwd()
    assert cfg.data_dir == os.getcwd() + "/data"


def test_overlay_and_override(config_tree):
    cfg = load_config(
        ["+experiment=exp1", "model.threshold=0.5", "extra.flag=true"],
        config_dir=config_tree)
    assert cfg.type == "inference"
    assert cfg.model.path.endswith("/data/m.ckpt")
    assert cfg.model.threshold == 0.5
    assert cfg.extra.flag is True
    # whole-string interpolation preserves type (set before override)
    assert cfg.nested.ref == 0.5


def test_override_types(config_tree):
    cfg = load_config(
        ["+experiment=exp1", "a=1", "b=2.5", "c=False", "d=hello",
         "e=[1,2]"], config_dir=config_tree)
    assert cfg.a == 1 and cfg.b == 2.5 and cfg.c is False
    assert cfg.d == "hello" and cfg.e == [1, 2]


def test_repo_configs_compose():
    """The shipped configs must load without errors."""
    for ov in (["+experiment=test_GATsSPG"], ["+experiment=test_sample"],
               ["+experiment=train_GATsSPG"],
               ["+experiment=object_detector"],
               ["+preprocess=sfm_spp_spg_test"],
               ["+preprocess=sfm_spp_spg_sample"],
               ["+preprocess=merge_anno", "split=val"]):
        cfg = load_config(ov, config_dir="configs")
        assert "type" in cfg


def test_expand_multirun():
    """Hydra basic-sweeper surface: comma-valued overrides sweep; commas
    inside brackets are one YAML value; + overlays never sweep."""
    from onepose_tpu.config import expand_multirun

    combos = expand_multirun(["a=1,2", "b.c=x"])
    assert combos == [["a=1", "b.c=x"], ["a=2", "b.c=x"]]

    combos = expand_multirun(["lr=1e-3,1e-4", "milestones=[5,10]"])
    assert combos == [["lr=1e-3", "milestones=[5,10]"],
                      ["lr=1e-4", "milestones=[5,10]"]]

    combos = expand_multirun(["+experiment=a", "x=1,2", "y=u,v"])
    assert len(combos) == 4
    assert all(c[0] == "+experiment=a" for c in combos)
