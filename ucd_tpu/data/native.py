"""ctypes bindings for the native host-side data ops (native/data_ops.cc).

Replaces the reference's per-pixel Python label remapping
(dataset/voc.py:186-207 `tensor.apply_`) and per-sample torchvision tensor
math with C++ loops. Every entry point has a numpy fallback so the framework
runs without the compiled library; `HAS_NATIVE` reports availability.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(__file__)
    candidates = [
        os.environ.get("UCD_TPU_NATIVE_LIB", ""),
        # installed package: scripts/build_native.sh copies into ucd_tpu/lib
        os.path.join(here, "..", "lib", "libucd_data_ops.so"),
        # repo checkout: built in-place under native/
        os.path.join(here, "..", "..", "native", "libucd_data_ops.so"),
    ]
    path = next((os.path.abspath(p) for p in candidates
                 if p and os.path.exists(p)), "")
    if path:
        lib = ctypes.CDLL(path)
        lib.remap_labels_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.remap_labels_u8_to_i32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.normalize_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.confusion_update_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        lib.pil_resize_pair_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _LIB = lib
    else:
        _LIB = False
    return _LIB


def has_native() -> bool:
    return bool(_load())


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def remap_labels(lbl: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """LUT remap of a uint8/int label array.

    When both the input and every LUT value fit uint8 (true for every
    supported dataset: <=256 class ids incl. the 255 ignore), the result
    STAYS uint8 — labels then ship to the device at 1/4 the int32 bytes
    and the jitted steps widen on-device. Otherwise returns int32."""
    lut = np.ascontiguousarray(lut, np.int32)
    assert lut.size == 256
    lib = _load()
    if lbl.dtype == np.uint8 and lut.min() >= 0 and lut.max() <= 255:
        # u8 -> u8 table gather: numpy's take is already memory-bound here
        return lut.astype(np.uint8)[lbl]
    if lib and lbl.dtype == np.uint8:
        src = np.ascontiguousarray(lbl)
        out = np.empty(lbl.shape, np.int32)
        lib.remap_labels_u8_to_i32(_ptr(src, ctypes.c_uint8),
                                   _ptr(out, ctypes.c_int32),
                                   src.size, _ptr(lut, ctypes.c_int32))
        return out
    if lib and lbl.dtype == np.int32:
        out = np.ascontiguousarray(lbl).copy()
        lib.remap_labels_i32(_ptr(out, ctypes.c_int32), out.size,
                             _ptr(lut, ctypes.c_int32))
        return out
    return lut[np.clip(lbl.astype(np.int64), 0, 255)]


def normalize_image(img_u8: np.ndarray, mean: np.ndarray,
                    std: np.ndarray) -> np.ndarray:
    """uint8 HWC -> normalized float32 HWC in one pass."""
    lib = _load()
    c = img_u8.shape[-1]
    if lib and img_u8.dtype == np.uint8 and c <= 8:
        src = np.ascontiguousarray(img_u8)
        out = np.empty(src.shape, np.float32)
        mean32 = np.ascontiguousarray(mean, np.float32)
        std32 = np.ascontiguousarray(std, np.float32)
        lib.normalize_u8_to_f32(_ptr(src, ctypes.c_uint8),
                                _ptr(out, ctypes.c_float),
                                src.size // c, c,
                                _ptr(mean32, ctypes.c_float),
                                _ptr(std32, ctypes.c_float))
        return out
    x = img_u8.astype(np.float32) / 255.0
    return (x - mean) / std


def pil_resize_pair(img: np.ndarray, lbl: np.ndarray, oh: int, ow: int,
                    crop=None, flip: bool = False):
    """PIL-exact paired crop+resize(+flip): bilinear (Pillow Resample.c
    fixed-point algorithm, bit-identical) for the image, Pillow NEAREST for
    the label. `crop` = (top, left, ch, cw) window; None = whole image.
    This is the geometric core of RandomResizedCrop/Resize — the product
    train pipeline routes through here when the native lib is built."""
    lib = _load()
    h, w = img.shape[:2]
    top, left, ch, cw = crop if crop is not None else (0, 0, h, w)
    if lib and img.dtype == np.uint8 and lbl.dtype == np.uint8 \
            and img.ndim == 3:
        img = np.ascontiguousarray(img)
        lbl = np.ascontiguousarray(lbl)
        io = np.empty((oh, ow, img.shape[2]), np.uint8)
        lo = np.empty((oh, ow), np.uint8)
        lib.pil_resize_pair_u8(_ptr(img, ctypes.c_uint8),
                               _ptr(lbl, ctypes.c_uint8),
                               _ptr(io, ctypes.c_uint8),
                               _ptr(lo, ctypes.c_uint8),
                               w, img.shape[2], top, left, ch, cw,
                               oh, ow, int(flip))
        return io, lo
    # PIL fallback: crop-then-resize (reference torchvision resized_crop
    # semantics — NOT box-resize, whose filter window can cross crop edges)
    from PIL import Image
    im = Image.fromarray(img[top:top + ch, left:left + cw]).resize(
        (ow, oh), Image.BILINEAR)
    lb = Image.fromarray(lbl[top:top + ch, left:left + cw]).resize(
        (ow, oh), Image.NEAREST)
    io, lo = np.asarray(im), np.asarray(lb)
    if flip:
        io, lo = io[:, ::-1].copy(), lo[:, ::-1].copy()
    return io, lo


def confusion_update(hist: np.ndarray, lbl: np.ndarray,
                     pred: np.ndarray) -> np.ndarray:
    """Host-side confusion accumulation (int64 hist, in-place)."""
    lib = _load()
    n_classes = hist.shape[0]
    if lib:
        l32 = np.ascontiguousarray(lbl.reshape(-1), np.int32)
        p32 = np.ascontiguousarray(pred.reshape(-1), np.int32)
        lib.confusion_update_i32(_ptr(l32, ctypes.c_int32),
                                 _ptr(p32, ctypes.c_int32), l32.size,
                                 n_classes, _ptr(hist, ctypes.c_int64))
        return hist
    mask = (lbl >= 0) & (lbl < n_classes)
    idx = n_classes * lbl[mask].astype(np.int64) + pred[mask]
    hist += np.bincount(idx, minlength=n_classes**2).reshape(n_classes,
                                                            n_classes)
    return hist
