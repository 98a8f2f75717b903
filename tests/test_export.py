"""Deployment export (engine/export.py): checkpoint -> standalone
inference npz -> CLI predict, without any Config at load time.

The reference has no deployment surface (predictions require the full
test.py eval entry); the round trip asserted here is the new serving
contract: bf16 export stays prediction-identical to the training
variables, and `ucd_tpu predict` runs from the npz + image files alone."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from ucd_tpu import config
from ucd_tpu.engine import build_train_state
from ucd_tpu.engine.checkpoint import save_checkpoint
from ucd_tpu.engine.export import (collect_images, export_inference,
                                   load_inference, predict_paths)
from ucd_tpu.engine.predictor import Predictor
from ucd_tpu.models import make_model


def _small_cfg(**kw):
    return config.make_config(
        dataset="voc", task="19-1", step=0, method="FT", epochs=1,
        batch_size=2, crop_size=32, backbone="resnet50", dtype="float32",
        pretrained=False, overlap=True, pooling=4, **kw)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    d = tmp_path_factory.mktemp("export")
    cfg = _small_cfg()
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0), 4,
                                 input_shape=(1, 32, 32, 3))
    ckpt = os.path.join(d, "ckpt")
    save_checkpoint(ckpt, state, epoch=0, best_score=0.0)
    out = os.path.join(d, "model.npz")
    meta = export_inference(ckpt, out, cfg, export_dtype="bfloat16")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, model, variables, out, meta, str(d)


def test_export_meta_and_size(exported):
    cfg, model, variables, out, meta, d = exported
    assert meta["format"] == "ucd_tpu.inference.v1"
    assert meta["classes"] == list(cfg.classes_per_step)
    assert meta["backbone"] == "resnet50"
    assert meta["stem_s2d"] is False
    assert meta["path"] == out
    assert meta["bf16_keys"], "bf16 export should cast float params"
    # inference npz carries no optimizer/regularizer state: it must be
    # well under the f32 param bytes (bf16 halves params, drops momentum)
    param_bytes = sum(np.asarray(x).nbytes
                      for x in jax.tree_util.tree_leaves(variables))
    assert os.path.getsize(out) < param_bytes


def test_export_predicts_identically(exported):
    cfg, model, variables, out, meta, d = exported
    ex_model, ex_vars, _ = load_inference(out)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
    want = np.asarray(
        Predictor(model, variables, fused=False).predict_labels(img))
    # exported model computes in bf16 (meta dtype): compare prediction
    # agreement, allowing bf16-rounding flips at near-ties
    got = np.asarray(
        Predictor(ex_model, ex_vars, fused=False).predict_labels(img))
    assert (got == want).mean() > 0.98, (got != want).mean()


def test_f32_export_exact(exported):
    cfg, model, variables, out, meta, d = exported
    out32 = os.path.join(d, "model_f32.npz")
    ckpt = os.path.join(d, "ckpt")
    export_inference(ckpt, out32, cfg, export_dtype="float32")
    ex_model, ex_vars, meta32 = load_inference(out32)
    assert not meta32["bf16_keys"]
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
    want = np.asarray(
        Predictor(model, variables, fused=False).predict_labels(img))
    got = np.asarray(
        Predictor(ex_model, ex_vars, fused=False).predict_labels(img))
    np.testing.assert_array_equal(got, want)


def test_predict_paths_writes_pngs(exported, tmp_path):
    cfg, model, variables, out, meta, d = exported
    ex_model, ex_vars, _ = load_inference(out)
    rng = np.random.RandomState(2)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    # mixed sizes: both pad into the same 64-bucket program
    for name, (h, w) in (("a.png", (50, 61)), ("b.jpg", (64, 40))):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            imgdir / name)
    files = collect_images(str(imgdir))
    assert len(files) == 2
    written = predict_paths(ex_model, ex_vars, files, str(tmp_path / "out"),
                            dataset=meta["dataset"], bucket=64,
                            save_ids=True, fused=False)
    assert len(written) == 4  # ids + color per image
    color = Image.open(tmp_path / "out" / "a_color.png")
    assert color.size == (61, 50)  # cropped back to native size
    ids = np.asarray(Image.open(tmp_path / "out" / "a_ids.png"))
    assert ids.shape == (50, 61) and ids.max() < cfg.tot_classes


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_batched_predict_matches_batch1(exported, tmp_path):
    """Same-bucket batching (VERDICT r3 item 4): grouping images into
    batch_size device calls must match the batch-1 path, including the
    padded partial final chunk. f32 export; a sub-0.5% flip allowance covers
    argmax near-ties that XLA's batch-shape-dependent reduction orders can
    break differently (bf16 exports flip more — covered by the fixture's
    agreement test)."""
    cfg, model, variables, out, meta, d = exported
    out32 = os.path.join(d, "model_f32_batch.npz")
    export_inference(os.path.join(d, "ckpt"), out32, cfg,
                     export_dtype="float32")
    ex_model, ex_vars, _ = load_inference(out32)
    rng = np.random.RandomState(5)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    # 7 images over two buckets: bucket (64,64) gets 5 (one full chunk of 4
    # + a padded remainder of 1), bucket (64,128) gets 2 (natural-size chunk)
    sizes = [(50, 61), (64, 40), (33, 33), (64, 64), (17, 52),
             (60, 100), (64, 65)]
    for i, (h, w) in enumerate(sizes):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            imgdir / f"img{i}.png")
    files = collect_images(str(imgdir))

    kw = dict(dataset=meta["dataset"], bucket=64, save_ids=True,
              save_color=False, fused=False)
    w1 = predict_paths(ex_model, ex_vars, files, str(tmp_path / "o1"),
                       batch_size=1, **kw)
    wb = predict_paths(ex_model, ex_vars, files, str(tmp_path / "ob"),
                       batch_size=4, **kw)
    assert len(w1) == len(wb) == len(files)
    for i in range(len(sizes)):
        a = np.asarray(Image.open(tmp_path / "o1" / f"img{i}_ids.png"))
        b = np.asarray(Image.open(tmp_path / "ob" / f"img{i}_ids.png"))
        assert a.shape == sizes[i]
        assert (a != b).mean() <= 0.005, (
            f"img{i}: {(a != b).sum()} px differ between batch sizes")


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_threaded_io_deterministic_and_palette_exact(exported, tmp_path):
    """The threaded host IO path (VERDICT r4 next #3: decode window + encode
    pool) must be a pure speedup: io_workers=1 and io_workers=8 write
    identical files in an identical order, and the palettized color PNG
    decodes to exactly Label2Color(cmap)(ids)."""
    from ucd_tpu.utils.viz import Label2Color, color_map

    cfg, model, variables, out, meta, d = exported
    ex_model, ex_vars, _ = load_inference(out)
    rng = np.random.RandomState(7)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for i, (h, w) in enumerate([(40, 40), (50, 61), (33, 70), (40, 40),
                                (64, 64)]):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            imgdir / f"img{i}.png")
    files = collect_images(str(imgdir))
    kw = dict(dataset=meta["dataset"], bucket=64, batch_size=2,
              save_ids=True, fused=False)
    w1 = predict_paths(ex_model, ex_vars, files, str(tmp_path / "s1"),
                       io_workers=1, **kw)
    w8 = predict_paths(ex_model, ex_vars, files, str(tmp_path / "s8"),
                       io_workers=8, **kw)
    assert [os.path.basename(p) for p in w1] == \
           [os.path.basename(p) for p in w8]
    to_color = Label2Color(color_map(meta["dataset"]))
    for i in range(5):
        a = np.asarray(Image.open(tmp_path / "s1" / f"img{i}_ids.png"))
        b = np.asarray(Image.open(tmp_path / "s8" / f"img{i}_ids.png"))
        np.testing.assert_array_equal(a, b)
        rgb = np.asarray(Image.open(
            tmp_path / "s8" / f"img{i}_color.png").convert("RGB"))
        np.testing.assert_array_equal(rgb, to_color(b))


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_classes_derived_from_checkpoint_not_flags(tmp_path, capsys):
    """A stale/defaulted --task/--step cannot mis-describe the export: the
    per-step class list is read off the checkpoint's cls_{i} kernels. (As
    first shipped, exporting a step-5 checkpoint with a defaulted step=0
    cfg packed classes=[16]; Flax apply then silently dropped the extra
    heads and predictions never contained the incremental classes.)"""
    cfg1 = config.make_config(
        dataset="voc", task="15-5", step=1, method="FT", epochs=1,
        batch_size=2, crop_size=32, backbone="resnet50", dtype="float32",
        pretrained=False, overlap=True, pooling=4, debug=True)
    model1 = make_model(cfg1)  # heads (16, 5)
    state1, _ = build_train_state(cfg1, model1, jax.random.key(1), 4,
                                  input_shape=(1, 32, 32, 3))
    ckpt = os.path.join(tmp_path, "ckpt_step1")
    save_checkpoint(ckpt, state1, epoch=0, best_score=0.0)

    # export with a WRONG (step-0) cfg: classes must still come out right
    meta = export_inference(ckpt, os.path.join(tmp_path, "m.npz"),
                            _small_cfg(), export_dtype="float32")
    assert meta["classes"] == list(cfg1.classes_per_step) == [16, 5]
    assert "using the checkpoint's" in capsys.readouterr().out

    ex_model, ex_vars, _ = load_inference(meta["path"])
    assert ex_model.classes == (16, 5)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    want = np.asarray(
        Predictor(model1, {"params": state1.params,
                           "batch_stats": state1.batch_stats},
                  fused=False).predict_labels(img))
    got = np.asarray(Predictor(ex_model, ex_vars,
                               fused=False).predict_labels(img))
    np.testing.assert_array_equal(got, want)


def test_export_path_without_npz_suffix(exported, tmp_path):
    """np.savez silently appends .npz; the reported path must match the
    written file so a follow-up predict --model <path> finds it."""
    cfg, model, variables, out, meta, d = exported
    meta2 = export_inference(os.path.join(d, "ckpt"),
                             str(tmp_path / "model"), cfg,
                             export_dtype="float32")
    assert meta2["path"].endswith("model.npz")
    assert os.path.exists(meta2["path"])
    load_inference(meta2["path"])


def test_predict_paths_stem_collision(exported, tmp_path):
    """a.png and a.jpg in one input directory must not clobber each
    other's prediction files."""
    cfg, model, variables, out, meta, d = exported
    ex_model, ex_vars, _ = load_inference(out)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.RandomState(4)
    for name in ("a.png", "a.jpg"):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            imgdir / name)
    written = predict_paths(ex_model, ex_vars, collect_images(str(imgdir)),
                            str(tmp_path / "out"), dataset=meta["dataset"],
                            bucket=64, save_ids=True, fused=False)
    assert len(written) == len(set(written)) == 4
    assert all(os.path.exists(p) for p in written)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_stem_collision_naming_is_batch_size_invariant(exported, tmp_path):
    """WHICH colliding input gets the bare stem and which gets the _1
    suffix is decided by INPUT order, not by flush order: a.jpg (a later,
    different-bucket duplicate stem) must not steal 'a_ids.png' from a.png
    just because its bucket happened to flush first under batching."""
    cfg, model, variables, out, meta, d = exported
    ex_model, ex_vars, _ = load_inference(out)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.RandomState(6)
    # collect_images sorts: a.jpg (the LONE 64x128-bucket image) precedes
    # a.png (64x64 bucket). At batch_size=3 the fillers make a.png's
    # bucket fill and flush FIRST while a.jpg still waits — so write-order
    # stem assignment (the old bug) would hand a.png the bare 'a' stem
    # that input order owes to a.jpg
    Image.fromarray(rng.randint(0, 255, (40, 100, 3), np.uint8)).save(
        imgdir / "a.jpg")
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
        imgdir / "a.png")
    for n in ("y.png", "z.png"):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            imgdir / n)
    files = collect_images(str(imgdir))
    assert [os.path.basename(f) for f in files] == [
        "a.jpg", "a.png", "y.png", "z.png"]

    outs = {}
    for tag, bs in (("b1", 1), ("b3", 3)):
        predict_paths(ex_model, ex_vars, files, str(tmp_path / tag),
                      dataset=meta["dataset"], bucket=64, batch_size=bs,
                      save_ids=True, save_color=False, fused=False)
        outs[tag] = {p: np.asarray(Image.open(tmp_path / tag / p)).shape
                     for p in ("a_ids.png", "a_1_ids.png")}
    # same file gets the same input's prediction at every batch size:
    # a.jpg (first in input order, 40x100) owns the bare stem in both runs
    assert outs["b1"] == outs["b3"]
    assert outs["b1"]["a_ids.png"] == (40, 100)
    assert outs["b1"]["a_1_ids.png"] == (64, 64)


def test_city_domain_palette():
    """predict over a city_domain export must not crash on the palette
    (train-ids 0..18; 0 = road = the full palette's entry 1)."""
    from ucd_tpu.utils.viz import (CITYSCAPES_COLORS, Label2Color,
                                   color_map)
    cmap = color_map("city_domain")
    assert tuple(cmap[0]) == CITYSCAPES_COLORS[1]  # road
    assert tuple(cmap[18]) == CITYSCAPES_COLORS[19]
    assert tuple(cmap[255]) == (0, 0, 0)  # void
    out = Label2Color(cmap)(np.array([[0, 18, 255]]))
    assert out.shape == (1, 3, 3)


def test_cli_export_and_predict(exported, tmp_path, capsys):
    cfg, model, variables, out, meta, d = exported
    from ucd_tpu.cli import main
    npz = str(tmp_path / "cli_model.npz")
    rc = main(["export", "--ckpt", os.path.join(d, "ckpt"), "--out", npz,
               "--backbone", "resnet50", "--pooling", "4",
               "--no_pretrained"])
    assert rc == 0 and os.path.exists(npz)
    assert "resnet50" in capsys.readouterr().out

    img = tmp_path / "one.png"
    Image.fromarray(np.random.RandomState(3).randint(
        0, 255, (40, 52, 3), np.uint8)).save(img)
    rc = main(["predict", "--model", npz, "--images", str(img),
               "--out", str(tmp_path / "pred"), "--bucket", "64",
               "--no_fused"])
    assert rc == 0
    assert os.path.exists(tmp_path / "pred" / "one_color.png")
