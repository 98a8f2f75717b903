"""Real-file dataset reading: miniature on-disk VOC / ADE / Cityscapes
trees -> reader -> incremental filter (with .npy idx cache) -> LUT remap ->
paired transform -> DataLoader batches. The rest of the suite injects
synthetic in-memory bases; this is the only place the actual file-layout
conventions (reference dataset/{voc,ade,cityscape}.py) are exercised."""

import os

import numpy as np
import pytest
from PIL import Image

from ucd_tpu.data import DataLoader, make_incremental_dataset
from ucd_tpu.data.transforms import train_transform

SIZE = 24


def _save(path, arr, mode=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr, mode=mode).save(path)


def _rand_img(rng):
    return rng.randint(0, 256, (SIZE, SIZE, 3)).astype(np.uint8)


def make_voc_tree(root, rng, n=6):
    lines = []
    for i in range(n):
        img = f"JPEGImages/img{i}.jpg"
        lbl = f"SegmentationClassAug/img{i}.png"
        _save(os.path.join(root, img), _rand_img(rng))
        # labels contain class 16 (a "new" class for 15-5 step 1) in half
        # the images so the incremental filter keeps exactly those
        lab = rng.randint(0, 16, (SIZE, SIZE)).astype(np.uint8)
        if i % 2 == 0:
            lab[4:12, 4:12] = 16
        _save(os.path.join(root, lbl), lab)
        lines.append(f"/{img} /{lbl}")
    os.makedirs(os.path.join(root, "splits"), exist_ok=True)
    with open(os.path.join(root, "splits", "train_aug.txt"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(root, "splits", "val.txt"), "w") as f:
        f.write("\n".join(lines[:2]))


def test_voc_disk_end_to_end(tmp_path, rng):
    root = str(tmp_path / "voc")
    make_voc_tree(root, rng)
    cache = str(tmp_path / "train-1.npy")
    dst = make_incremental_dataset(
        "voc", root, train=True, transform=train_transform(SIZE),
        labels=[16, 17, 18, 19, 20], labels_old=list(range(1, 16)),
        idxs_path=cache, masking=True, overlap=True)
    assert len(dst) == 3               # filter kept the class-16 images
    assert os.path.exists(cache)       # idx cache written (run.py:87-96)
    for batch in DataLoader(dst, 2, seed=0, drop_last=False,
                            shuffle=False).epoch(0):
        assert batch["image"].shape[1:] == (SIZE, SIZE, 3)
        assert batch["image"].dtype == np.float32
        labs = np.unique(batch["label"])
        # remapped ids only: {0, 16, 255-ignore}; old classes masked to 0
        assert set(labs.tolist()) <= {0, 16, 255}
    # second construction must LOAD the cache (delete the images' labels to
    # prove the filter is not recomputed)
    dst2 = make_incremental_dataset(
        "voc", root, train=True, transform=train_transform(SIZE),
        labels=[16, 17, 18, 19, 20], labels_old=list(range(1, 16)),
        idxs_path=cache, masking=True, overlap=True)
    assert len(dst2) == 3


def test_ade_disk_reader(tmp_path, rng):
    root = str(tmp_path / "ade")
    for i in range(3):
        _save(os.path.join(root, "ADEChallengeData2016", "images",
                           "training", f"a{i}.jpg"), _rand_img(rng))
        lab = rng.randint(0, 151, (SIZE, SIZE)).astype(np.uint8)
        _save(os.path.join(root, "ADEChallengeData2016", "annotations",
                           "training", f"a{i}.png"), lab)
    from ucd_tpu.data import AdeSegmentation
    ds = AdeSegmentation(root, train=True)
    assert len(ds) == 3
    img, lbl = ds[0]
    assert img.shape == (SIZE, SIZE, 3) and lbl.shape == (SIZE, SIZE)


def test_city_disk_reader_collapse(tmp_path, rng):
    root = str(tmp_path / "city")
    base = os.path.join(root, "Cityscapes")
    for city, i in (("aachen", 0), ("bochum", 1)):
        img = os.path.join(base, "leftImg8bit", "train", city,
                           f"{city}_00000{i}_leftImg8bit.png")
        _save(img, _rand_img(rng))
        lab = rng.randint(0, 34, (SIZE, SIZE)).astype(np.uint8)
        _save(os.path.join(base, "gtFine", "train", city,
                           f"{city}_00000{i}_gtFine_labelIds.png"), lab)
    from ucd_tpu.data import CitySegmentation
    ds = CitySegmentation(root, train=True)
    assert len(ds) == 2
    _, lbl = ds[0]
    # 34 raw ids collapsed into the 20-way train space
    assert lbl.max() <= 19


@pytest.mark.slow
def test_cli_train_on_disk_voc(tmp_path, rng, monkeypatch, capsys):
    """The complete user journey with NO synthetic injection: real VOC file
    tree -> cli train (reference run.py flow) -> idx caches under
    data/voc/<task>/ -> checkpoint + JSON result."""
    import json

    from ucd_tpu.cli import main

    root = str(tmp_path / "voc")
    make_voc_tree(root, rng, n=8)
    monkeypatch.chdir(tmp_path)  # idx caches land in ./data/voc/19-1
    rc = main([
        "train", "--dataset", "voc", "--task", "19-1", "--step", "0",
        "--method", "FT", "--data_root", root, "--backbone", "resnet50",
        "--crop_size", str(SIZE), "--batch_size", "2", "--epochs", "1",
        "--dtype", "float32", "--no_pretrained", "--no_pallas",
        "--logdir", str(tmp_path / "logs"),
        "--ckpt_dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    res = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert res and res[-1]["step"] == 0
    assert os.path.exists(str(tmp_path / "data" / "voc" / "19-1"))
    assert os.path.exists(str(tmp_path / "ckpt" / "19-1-voc_Experiment_0"))
