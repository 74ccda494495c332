"""Load-guarded ctypes bindings to the system libwebp — the lossy "VP8 "
WebP path.

The reference never carries a VP8 entropy decoder of its own: lossy .webp
goes through ``cv::imdecode`` (cpp/src/task_linux.cpp:67-122), i.e. OpenCV
DELEGATES to its bundled libwebp.  This module is the same delegation
against the system ``libwebp.so`` via ctypes — no Python package, no
install; when the shared library is absent every function returns ``None``
and ``decode_webp`` keeps the documented lossy seam.

It also serves as the INTEROP ORACLE for the pure-Python VP8L codec in
functions/webp.py: tests/test_imagecodecs.py round-trips our VP8L encoder
output through libwebp's decoder and libwebp's lossless encoder output
through our decoder (both byte-exact), which pins the hand-written
bitstream work against the real library.
"""

from __future__ import annotations

import ctypes

import numpy as np

_LIB = None
_LIB_TRIED = False

_CANDIDATES = ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib",
               "libwebp.dylib")


def _lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for name in _CANDIDATES:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPDecodeRGB.restype = ctypes.c_void_p
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p)]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    """True when a usable system libwebp was found."""
    return _lib() is not None


def decode_rgb(payload: bytes) -> np.ndarray | None:
    """Any-WebP -> HxWx3 uint8 RGB via libwebp; None if the library is
    absent or rejects the payload (malformed input never raises)."""
    lib = _lib()
    if lib is None or not payload:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = lib.WebPDecodeRGB(payload, len(payload),
                            ctypes.byref(w), ctypes.byref(h))
    if not ptr or w.value <= 0 or h.value <= 0:
        return None
    try:
        buf = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_ubyte))
        return np.ctypeslib.as_array(
            buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.WebPFree(ctypes.c_void_p(ptr))


def decode_yuv(payload: bytes):
    """Any-WebP -> (y, u, v) uint8 planes via libwebp's WebPDecodeYUV —
    the BYTE-EXACT oracle for the pure-Python VP8 decoder (functions/vp8:
    YUV reconstruction is normative, RGB upsampling is not).  None if the
    library is absent or rejects the payload."""
    lib = _lib()
    if lib is None or not payload:
        return None
    try:
        lib.WebPDecodeYUV.restype = ctypes.c_void_p
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    except AttributeError:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    up = ctypes.c_void_p()
    vp = ctypes.c_void_p()
    stride = ctypes.c_int(0)
    uv_stride = ctypes.c_int(0)
    ptr = lib.WebPDecodeYUV(payload, len(payload), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(up),
                            ctypes.byref(vp), ctypes.byref(stride),
                            ctypes.byref(uv_stride))
    if not ptr or w.value <= 0 or h.value <= 0:
        return None
    try:
        W, H, S, US = w.value, h.value, stride.value, uv_stride.value
        uw, uh = (W + 1) >> 1, (H + 1) >> 1
        y = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_ubyte)),
            shape=(H, S))[:, :W].copy()
        u = np.ctypeslib.as_array(
            ctypes.cast(up, ctypes.POINTER(ctypes.c_ubyte)),
            shape=(uh, US))[:, :uw].copy()
        v = np.ctypeslib.as_array(
            ctypes.cast(vp, ctypes.POINTER(ctypes.c_ubyte)),
            shape=(uh, US))[:, :uw].copy()
        return y, u, v
    finally:
        lib.WebPFree(ctypes.c_void_p(ptr))


def _as_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    return np.ascontiguousarray(img[..., :3], dtype=np.uint8)


def encode_lossy_rgb(img: np.ndarray, quality: float = 95.0) -> bytes | None:
    """RGB -> lossy "VP8 " WebP bytes; None if libwebp is absent."""
    lib = _lib()
    if lib is None:
        return None
    img = _as_rgb(img)
    h, w, _ = img.shape
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(img.ctypes.data, w, h, w * 3,
                          float(quality), ctypes.byref(out))
    if not n or not out:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def encode_lossless_rgb(img: np.ndarray) -> bytes | None:
    """RGB -> lossless VP8L WebP bytes via libwebp (the interop oracle for
    the pure-Python decoder); None if libwebp is absent."""
    lib = _lib()
    if lib is None:
        return None
    img = _as_rgb(img)
    h, w, _ = img.shape
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGB(img.ctypes.data, w, h, w * 3,
                                  ctypes.byref(out))
    if not n or not out:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)
