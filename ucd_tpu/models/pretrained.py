"""Pretrained-backbone checkpoint converter.

The reference initializes ResNet bodies from the mapillary inplace-abn
ImageNet release (`pretrained/{backbone}_{norm_act}.pth.tar`,
reference segmentation_module.py:25-43: torch.load, strip the 'module.'
prefix, drop the fc head). This module converts that torch state dict into
the flax param/batch_stats trees of `models.resnet.ResNet`:

  torch `mod1.conv1.weight` (OIHW)        -> params body/mod1_conv1/kernel (HWIO)
  torch `mod1.bn1.{weight,bias}`          -> params body/mod1_bn1/bn/{scale,bias}
  torch `mod1.bn1.running_{mean,var}`     -> batch_stats body/mod1_bn1/bn/{mean,var}
  torch `modK.blockJ.convs.convI.weight`  -> params body/modK_blockJ/convI/kernel
  torch `modK.blockJ.convs.bnI.*`         -> .../bnI/bn/*
  torch `modK.blockJ.proj_{conv,bn}.*`    -> .../proj_{conv,bn}/...

The ABN math is identical (BatchNorm + leaky_relu(0.01)); inplace-abn merely
computes it in-place, so weights transfer verbatim.

Torch is an OFFLINE dev dependency only: convert the release once with

    python -m ucd_tpu.models.pretrained convert resnet101_iabn_sync.pth.tar \
        pretrained/resnet101_iabn_sync.npz

and the training process loads the `.npz` torch-free (a production TPU pod
image does not ship torch; VERDICT.md round-2 item 6). `.pth/.pth.tar`
paths still load directly when torch is importable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def strip_module_prefix(state_dict: dict) -> dict:
    """Drop the DataParallel 'module.' prefix and the classifier head
    (reference segmentation_module.py:30-40)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("classifier."):
            continue
        out[k] = v
    return out


def convert_torch_body(state_dict: dict) -> dict:
    """torch ResNet body state dict -> {'params': ..., 'batch_stats': ...}
    flax subtrees for the `body` module."""
    state_dict = strip_module_prefix(state_dict)
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] == "mod1":
            # mod1.conv1.weight / mod1.bn1.*
            sub, leaf = parts[1], parts[2]
            if sub == "conv1" and leaf == "weight":
                put(params, ("mod1_conv1", "kernel"), _conv_kernel(val))
            elif sub == "bn1":
                _put_bn(params, stats, ("mod1_bn1",), leaf, val, put)
        elif parts[0].startswith("mod"):
            # modK.blockJ.convs.convI.weight | modK.blockJ.convs.bnI.* |
            # modK.blockJ.proj_conv.weight | modK.blockJ.proj_bn.*
            block = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "convs":
                sub, leaf = rest[1], rest[2]
                if sub.startswith("conv") and leaf == "weight":
                    put(params, (block, sub, "kernel"), _conv_kernel(val))
                elif sub.startswith("bn"):
                    _put_bn(params, stats, (block, sub), leaf, val, put)
            elif rest[0] == "proj_conv" and rest[1] == "weight":
                put(params, (block, "proj_conv", "kernel"), _conv_kernel(val))
            elif rest[0] == "proj_bn":
                _put_bn(params, stats, (block, "proj_bn"), rest[1], val, put)
    return {"params": params, "batch_stats": stats}


def _put_bn(params, stats, prefix, leaf, val, put):
    if leaf == "weight":
        put(params, prefix + ("bn", "scale"), val)
    elif leaf == "bias":
        put(params, prefix + ("bn", "bias"), val)
    elif leaf == "running_mean":
        put(stats, prefix + ("bn", "mean"), val)
    elif leaf == "running_var":
        put(stats, prefix + ("bn", "var"), val)
    # num_batches_tracked is dropped


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


def save_body_npz(body: dict, path: str) -> None:
    """Write a converted {'params','batch_stats'} body tree as .npz."""
    np.savez(path, **_flatten(body))


def load_body_npz(path: str) -> dict:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def load_pretrained_torch(path: str) -> dict:
    """Load + convert a `.pth.tar` release file (torch CPU, offline/dev)."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_body(sd)


def load_pretrained_body(path: str) -> Optional[dict]:
    """Load a pretrained body: `.npz` (torch-free, the production path) or
    `.pth/.pth.tar` (requires torch — convert offline via the CLI below).
    Returns {'params', 'batch_stats'} for the `body` module, or None if the
    file is missing. Prefers a sibling `.npz` of a requested `.pth[.tar]`
    so converted-once hosts never import torch."""
    import os
    if path.endswith(".npz"):
        return load_body_npz(path) if os.path.exists(path) else None
    sibling = _npz_sibling(path)
    if os.path.exists(sibling):
        return load_body_npz(sibling)
    if not os.path.exists(path):
        return None
    return load_pretrained_torch(path)


def _npz_sibling(path: str) -> str:
    for suf in (".pth.tar", ".pth"):
        if path.endswith(suf):
            return path[: -len(suf)] + ".npz"
    return path + ".npz"


def _cli(argv=None):
    """`python -m ucd_tpu.models.pretrained convert <pth.tar> [out.npz]`"""
    import argparse
    p = argparse.ArgumentParser(prog="ucd_tpu.models.pretrained")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="torch release -> torch-free .npz")
    c.add_argument("src")
    c.add_argument("dst", nargs="?", default=None)
    args = p.parse_args(argv)
    dst = args.dst or _npz_sibling(args.src)
    body = load_pretrained_torch(args.src)
    save_body_npz(body, dst)
    n = len(_flatten(body))
    print(f"wrote {dst} ({n} arrays)")
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys
    sys.exit(_cli())
