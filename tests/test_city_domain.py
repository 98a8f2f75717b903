"""Domain-incremental Cityscapes wiring (reference shipped the dataset class
but never registered tasks for it — SURVEY.md §2.5; here it is first-class)."""

import numpy as np
import pytest

import jax

from ucd_tpu import config, tasks
from ucd_tpu.data.datasets import make_incremental_dataset
from ucd_tpu.data.transforms import train_transform


class FakeDomainBase:
    """21-domain synthetic stand-in for CityscapesSegmentationDomain."""

    def __init__(self, per_domain=4, size=16):
        rng = np.random.RandomState(0)
        self.items = []
        for d in range(21):
            for _ in range(per_domain):
                img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
                lbl = rng.randint(0, 19, (size, size)).astype(np.uint8)
                lbl[0, 0] = 255
                self.items.append((img, lbl, d))

    def __getitem__(self, i):
        img, lbl, _ = self.items[i]
        return img, lbl

    def domain(self, i):
        return self.items[i][2]

    def __len__(self):
        return len(self.items)


def test_task_registry():
    labels, old, path = tasks.get_task_labels("city_domain", "11-5", 1)
    assert labels == [11, 12, 13, 14, 15]
    assert old == list(range(11))
    assert tasks.get_task_dict("city_domain", "1-1")[20] == [20]


def test_config_constraints():
    cfg = config.make_config(dataset="city_domain", task="11-5", step=1,
                             method="LWF")
    assert cfg.classes_per_step == [19]
    assert cfg.num_classes == 19
    with pytest.raises(AssertionError):
        config.make_config(dataset="city_domain", task="11-5", step=1,
                           method="UCD")


def test_domain_dataset_split():
    base = FakeDomainBase()
    tr = make_incremental_dataset("city_domain", "", train=True,
                                  transform=train_transform(16),
                                  labels=[0, 1, 2], base=base)
    va = make_incremental_dataset("city_domain", "", train=False,
                                  transform=train_transform(16),
                                  labels=[0, 1, 2], base=base)
    assert len(tr) + len(va) == 12  # 3 domains x 4 images
    assert len(tr) == 9  # 80/20
    # all selected images come from the requested domains
    for subset in (tr, va):
        for i in subset.indices:
            assert base.domain(i) in (0, 1, 2)
    img, lbl = tr.get(0, np.random.default_rng(0))
    assert img.shape == (16, 16, 3) and lbl.shape == (16, 16)


@pytest.mark.slow
def test_domain_incremental_trains(rng):
    """One LWF step with fixed head: cls_0 must keep training at step > 0."""
    import jax.numpy as jnp
    from ucd_tpu.engine import build_train_state, make_train_step
    from ucd_tpu.models import make_model

    size = 32
    cfg = config.make_config(dataset="city_domain", task="11-5", step=1,
                             method="LWF", backbone="resnet50",
                             crop_size=size, batch_size=2, dtype="float32")
    model = make_model(cfg)
    model_old = make_model(cfg, classes=cfg.classes_per_step)
    s0, _ = build_train_state(cfg, model_old, jax.random.key(0), 4,
                              input_shape=(1, size, size, 3))
    prev = {"params": jax.device_get(s0.params),
            "batch_stats": jax.device_get(s0.batch_stats)}
    state, old_vars = build_train_state(cfg, model, jax.random.key(1), 4,
                                        prev_model_state=prev,
                                        input_shape=(1, size, size, 3))
    ts = jax.jit(make_train_step(cfg, model, model_old, 4))
    batch = {"image": jnp.array(rng.randn(2, size, size, 3), jnp.float32),
             "label": jnp.array(rng.randint(0, 19, (2, size, size)),
                                jnp.int32)}
    before = np.asarray(state.params["cls_0"]["kernel"]).copy()
    state, m = ts(state, batch, old_vars)
    assert np.isfinite(float(m["loss_tot"]))
    assert float(m["lkd"]) != 0.0
    after = np.asarray(state.params["cls_0"]["kernel"])
    assert np.abs(after - before).sum() > 0  # head NOT frozen
