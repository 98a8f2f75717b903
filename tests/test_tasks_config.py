"""Task registry and config golden tests (vs reference tasks.py semantics)."""

import pytest

from ucd_tpu import config, tasks


def test_voc_15_5s_steps():
    labels, old, path = tasks.get_task_labels("voc", "15-5s", 3)
    assert labels == [18]
    assert old == list(range(16)) + [16, 17]
    assert path == "data/voc/15-5s"


def test_per_task_classes():
    assert tasks.get_per_task_classes("voc", "19-1", 1) == [20, 1]
    assert tasks.get_per_task_classes("voc", "15-5s", 5) == [16, 1, 1, 1, 1, 1]
    assert tasks.get_per_task_classes("ade", "100-50", 1) == [101, 50]
    assert tasks.get_per_task_classes("city", "13-6s", 2) == [14, 1, 1]


def test_task_tables_partition():
    # every task's steps partition a label set without overlap
    for ds, table in [("voc", tasks.TASKS_VOC), ("ade", tasks.TASKS_ADE),
                      ("city", tasks.TASKS_CITY)]:
        for name, steps in table.items():
            seen = set()
            for s, labs in steps.items():
                assert not (seen & set(labs)), f"{ds}/{name} step {s} overlaps"
                seen.update(labs)
            assert seen == set(range(tasks.get_task_dict(ds, "offline")[0][-1] + 1))


def test_method_presets():
    cfg = config.make_config(method="UCD", dataset="voc", task="15-5s", step=1)
    assert cfg.loss_kd == 10.0 and cfg.unce and cfg.unkd and cfg.init_balanced
    assert cfg.contrastive
    cfg = config.make_config(method="LWF")
    assert cfg.loss_kd == 100.0 and not cfg.contrastive
    cfg = config.make_config(method="ILT")
    assert cfg.loss_kd == 100.0 and cfg.loss_de == 100.0
    cfg = config.make_config(method="EWC")
    assert cfg.regularizer == "ewc" and cfg.reg_importance == 500.0
    cfg = config.make_config(method="LWF-MC")
    assert cfg.icarl and cfg.icarl_importance == 10.0


def test_config_derived():
    cfg = config.make_config(dataset="voc", task="15-5s", step=2)
    assert cfg.classes_per_step == [16, 1, 1]
    assert cfg.tot_classes == 18
    assert cfg.old_classes == 17
    assert cfg.new_classes == 1


def test_poly_lr():
    assert config.poly_lr(0.01, 0, 100) == pytest.approx(0.01)
    assert config.poly_lr(0.01, 50, 100) == pytest.approx(0.01 * 0.5**0.9)
    assert config.poly_lr(0.01, 100, 100) == pytest.approx(0.0)


def test_parse_xla_options():
    """--xla_options -> jit compiler_options dict. XLA_FLAGS cannot carry
    TPU-backend flags through a remote PJRT client (the LOCAL flag parser
    rejects them); compiler_options rides the compile request itself."""
    assert config.parse_xla_options("") is None
    assert config.parse_xla_options(None) is None
    assert config.parse_xla_options("k=v") == {"k": "v"}
    assert config.parse_xla_options(
        " a = 1 , b=true, C=False ") == {"a": "1", "b": True, "C": False}
    # values keep embedded '=' (first split only)
    assert config.parse_xla_options("a=b=c") == {"a": "b=c"}
    with pytest.raises(ValueError):
        config.parse_xla_options("novalue")


def test_xla_options_cli_and_jit_plumbing():
    """CLI round-trip + the parsed dict is accepted by jax.jit
    compiler_options (backend-neutral debug option, compiles and runs)."""
    import jax
    import jax.numpy as jnp

    from ucd_tpu.cli import build_parser, config_from_args
    args = build_parser().parse_args(
        ["train", "--dataset", "voc", "--task", "19-1",
         "--xla_options", "xla_embed_ir_in_executable=true"])
    cfg = config_from_args(args)
    assert cfg.xla_options == "xla_embed_ir_in_executable=true"
    opts = config.parse_xla_options(cfg.xla_options)
    out = jax.jit(lambda x: x * 2, compiler_options=opts)(jnp.ones((4,)))
    assert float(out.sum()) == 8.0
