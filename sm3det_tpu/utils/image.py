"""Host-side image library (numpy, PIL-backed warps where convenient).

Covers the mmcv image surface the reference framework builds its data
pipelines on (``mmcv/mmcv/image/{geometric,colorspace,photometric}.py``)
with original numpy implementations: geometric resize/rescale/flip/
rotate/pad/crop/shear/translate/cutout, BGR/RGB/gray/YCbCr colorspace
conversions, and the photometric adjustment family. Device-side
(augmentation-free) preprocessing stays in ``data/transforms.py``; this
module is the general-purpose host toolkit (browse/vis/demo tools,
offline pipelines).

All functions take HWC uint8/float arrays and preserve dtype unless
documented otherwise.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

__all__ = [
    "imread", "imwrite", "imfrombytes", "imdraw_polygons",
    "imresize", "imresize_like", "imresize_to_multiple", "rescale_size",
    "imrescale", "imflip", "imrotate", "bbox_clip", "bbox_scaling",
    "imcrop", "impad", "impad_to_multiple", "cutout", "imshear",
    "imtranslate",
    "imconvert", "bgr2rgb", "rgb2bgr", "bgr2gray", "rgb2gray",
    "gray2bgr", "gray2rgb", "rgb2ycbcr", "bgr2ycbcr", "ycbcr2rgb",
    "ycbcr2bgr",
    "imnormalize", "imdenormalize", "iminvert", "solarize", "posterize",
    "adjust_color", "imequalize", "adjust_brightness", "adjust_contrast",
    "auto_contrast", "adjust_sharpness", "lut_transform", "adjust_hue",
]


# ---------------------------------------------------------------------------
# IO (reference: mmcv/mmcv/image/io.py — imread/imwrite/imfrombytes;
# bytes go through the FileClient backends like the reference's)
# ---------------------------------------------------------------------------

def imfrombytes(content: bytes, flag: str = "color",
                channel_order: str = "bgr") -> np.ndarray:
    """Decode an encoded image buffer. ``flag``: 'color' | 'grayscale' |
    'unchanged'."""
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(content))
    if flag == "grayscale":
        return np.asarray(img.convert("L"))
    if flag == "unchanged":
        return np.asarray(img)
    arr = np.asarray(img.convert("RGB"))
    return arr if channel_order == "rgb" else arr[..., ::-1]


def imread(path: str, flag: str = "color",
           channel_order: str = "bgr") -> np.ndarray:
    """Read an image from disk/http/memory (FileClient-routed). Returns
    BGR by default like the reference (``mmcv/mmcv/image/io.py:143``)."""
    from .fileio import FileClient
    content = FileClient.infer_client(path).get(path)
    return imfrombytes(content, flag=flag, channel_order=channel_order)


def imwrite(img: np.ndarray, path: str, channel_order: str = "bgr"):
    """Write an HWC uint8 image (BGR input by default, matching imread)."""
    import io

    from PIL import Image

    from .fileio import FileClient
    arr = np.ascontiguousarray(img)
    if arr.ndim == 3 and channel_order == "bgr":
        arr = arr[..., ::-1]
    fmt = path.rsplit(".", 1)[-1].lower()
    fmt = {"jpg": "JPEG", "tif": "TIFF"}.get(fmt, fmt.upper())
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format=fmt)
    FileClient.infer_client(path).put(buf.getvalue(), path)


def imdraw_polygons(img: np.ndarray, polys, color=(255, 0, 0)
                    ) -> np.ndarray:
    """Paint (N, 8) polygon outlines into an HWC uint8 image
    (nearest-pixel line rasterization; the vis surface of
    ``mmcv/mmcv/visualization/image.py`` imshow_det_rbboxes)."""
    img = img.copy()
    h, w = img.shape[:2]
    for poly in polys:
        pts = np.asarray(poly, np.float32).reshape(4, 2)
        for i in range(4):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % 4]
            n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
            xs = np.linspace(x0, x1, n).astype(int).clip(0, w - 1)
            ys = np.linspace(y0, y1, n).astype(int).clip(0, h - 1)
            img[ys, xs] = color
    return img


# ---------------------------------------------------------------------------
# geometric (reference: mmcv/mmcv/image/geometric.py)
# ---------------------------------------------------------------------------

def _pil_resample(interpolation: str):
    from PIL import Image
    return {
        "nearest": Image.NEAREST,
        "bilinear": Image.BILINEAR,
        "bicubic": Image.BICUBIC,
        "lanczos": Image.LANCZOS,
    }[interpolation]


def imresize(img: np.ndarray, size: Tuple[int, int],
             return_scale: bool = False,
             interpolation: str = "bilinear"):
    """Resize to ``size=(w, h)`` (``geometric.py:77 imresize``)."""
    from PIL import Image
    h, w = img.shape[:2]
    dtype = img.dtype
    arr = img.astype(np.float32) if dtype != np.uint8 else img
    if arr.ndim == 2:
        out = np.asarray(Image.fromarray(arr).resize(
            size, _pil_resample(interpolation)))
    else:
        out = np.stack([
            np.asarray(Image.fromarray(arr[..., c]).resize(
                size, _pil_resample(interpolation)))
            for c in range(arr.shape[2])], axis=-1)
    out = out.astype(dtype, copy=False)
    if not return_scale:
        return out
    return out, size[0] / w, size[1] / h


def imresize_like(img: np.ndarray, dst_img: np.ndarray,
                  return_scale: bool = False,
                  interpolation: str = "bilinear"):
    """Resize to another image's size (``geometric.py:193``)."""
    h, w = dst_img.shape[:2]
    return imresize(img, (w, h), return_scale, interpolation)


def imresize_to_multiple(img: np.ndarray, divisor: Union[int, tuple],
                         size: Optional[tuple] = None,
                         scale_factor: Optional[float] = None,
                         keep_ratio: bool = False,
                         return_scale: bool = False,
                         interpolation: str = "bilinear"):
    """Resize so w, h are multiples of ``divisor`` (``geometric.py:127``)."""
    h, w = img.shape[:2]
    if size is not None and scale_factor is not None:
        raise ValueError("only one of size or scale_factor")
    if size is None:
        sf = scale_factor if scale_factor is not None else 1
        size = (int(w * sf), int(h * sf))
    elif keep_ratio:
        size = rescale_size((w, h), size)
    if isinstance(divisor, int):
        divisor = (divisor, divisor)
    size = tuple(int(np.ceil(s / d)) * d for s, d in zip(size, divisor))
    return imresize(img, size, return_scale, interpolation)


def rescale_size(old_size: tuple, scale, return_scale: bool = False):
    """New (w, h) for a scale spec (``geometric.py:217``): a float
    factor, or a (long, short) max-dims tuple."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        if scale <= 0:
            raise ValueError(f"Invalid scale {scale}")
        factor = scale
    elif isinstance(scale, tuple):
        max_long, max_short = max(scale), min(scale)
        factor = min(max_long / max(h, w), max_short / min(h, w))
    else:
        raise TypeError(f"scale must be number or tuple, got {scale!r}")
    new_size = (int(w * factor + 0.5), int(h * factor + 0.5))
    return (new_size, factor) if return_scale else new_size


def imrescale(img: np.ndarray, scale, return_scale: bool = False,
              interpolation: str = "bilinear"):
    """Aspect-preserving resize (``geometric.py:256``)."""
    h, w = img.shape[:2]
    new_size, factor = rescale_size((w, h), scale, return_scale=True)
    out = imresize(img, new_size, interpolation=interpolation)
    return (out, factor) if return_scale else out


def imflip(img: np.ndarray, direction: str = "horizontal") -> np.ndarray:
    """Flip (``geometric.py:289``); 'horizontal'/'vertical'/'diagonal'."""
    if direction == "horizontal":
        return np.flip(img, axis=1)
    if direction == "vertical":
        return np.flip(img, axis=0)
    if direction == "diagonal":
        return np.flip(img, axis=(0, 1))
    raise ValueError(f"invalid direction {direction}")


def _affine_warp(img: np.ndarray, mat: np.ndarray, out_h: int,
                 out_w: int, border_value: float,
                 interpolation: str) -> np.ndarray:
    """Inverse-map affine warp: ``dst(x) = src(M^-1 x)``, bilinear or
    nearest sampling, constant border. Original numpy formulation (the
    reference delegates to cv2.warpAffine)."""
    inv = np.linalg.inv(np.vstack([mat, [0, 0, 1]]))[:2]
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float32)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    h, w = img.shape[:2]
    arr = img if img.ndim == 3 else img[..., None]
    cf = arr.shape[2]
    dtype = arr.dtype
    fimg = arr.astype(np.float32)

    def sample(ix, iy):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = np.clip(ix, 0, w - 1)
        iyc = np.clip(iy, 0, h - 1)
        vals = fimg[iyc, ixc]
        vals[~valid] = border_value
        return vals, valid

    if interpolation == "nearest":
        out, _ = sample(np.round(sx).astype(np.int64),
                        np.round(sy).astype(np.int64))
    else:
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        v00, _ = sample(x0, y0)
        v01, _ = sample(x0 + 1, y0)
        v10, _ = sample(x0, y0 + 1)
        v11, _ = sample(x0 + 1, y0 + 1)
        out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
               v10 * (1 - fx) * fy + v11 * fx * fy)
    out = out.reshape(out_h, out_w, cf)
    if img.ndim == 2:
        out = out[..., 0]
    if np.issubdtype(dtype, np.integer):
        out = np.clip(np.round(out), np.iinfo(dtype).min,
                      np.iinfo(dtype).max)
    return out.astype(dtype)


def imrotate(img: np.ndarray, angle: float,
             center: Optional[Tuple[float, float]] = None,
             scale: float = 1.0, border_value: float = 0,
             interpolation: str = "bilinear",
             auto_bound: bool = False) -> np.ndarray:
    """Rotate ``angle`` degrees counter-clockwise around ``center``
    (``geometric.py:329 imrotate``; same angle convention — positive is
    clockwise in image coords because y points down there, matching
    cv2.getRotationMatrix2D semantics)."""
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    elif auto_bound:
        raise ValueError("auto_bound conflicts with explicit center")
    rad = np.deg2rad(angle)
    a = np.cos(rad) * scale
    b = np.sin(rad) * scale
    # cv2.getRotationMatrix2D: [[a, b, (1-a)cx - b cy], [-b, a, b cx + (1-a)cy]]
    mat = np.array([[a, b, (1 - a) * center[0] - b * center[1]],
                    [-b, a, b * center[0] + (1 - a) * center[1]]],
                   np.float64)
    out_h, out_w = h, w
    if auto_bound:
        cos = abs(a)
        sin = abs(b)
        out_w = int(h * sin + w * cos + 0.5)
        out_h = int(h * cos + w * sin + 0.5)
        mat[0, 2] += (out_w - w) * 0.5
        mat[1, 2] += (out_h - h) * 0.5
    return _affine_warp(img, mat, out_h, out_w, border_value,
                        interpolation)


def bbox_clip(bboxes: np.ndarray, img_shape: Tuple[int, int]):
    """Clip xyxy boxes to (h, w) bounds (``geometric.py:383``)."""
    cmin = np.empty(bboxes.shape[-1], dtype=bboxes.dtype)
    cmin[0::2] = img_shape[1] - 1
    cmin[1::2] = img_shape[0] - 1
    return np.maximum(np.minimum(bboxes, cmin), 0)


def bbox_scaling(bboxes: np.ndarray, scale: float,
                 clip_shape: Optional[Tuple[int, int]] = None):
    """Scale boxes about their centers (``geometric.py:401``)."""
    if float(scale) == 1.0:
        scaled = bboxes.copy()
    else:
        w = bboxes[..., 2] - bboxes[..., 0] + 1
        h = bboxes[..., 3] - bboxes[..., 1] + 1
        dw = (w * (scale - 1)) * 0.5
        dh = (h * (scale - 1)) * 0.5
        scaled = bboxes + np.stack([-dw, -dh, dw, dh], axis=-1)
    if clip_shape is not None:
        return bbox_clip(scaled, clip_shape)
    return scaled


def imcrop(img: np.ndarray, bboxes: np.ndarray, scale: float = 1.0,
           pad_fill=None):
    """Crop patch(es) from xyxy boxes (``geometric.py:429 imcrop``);
    out-of-image regions are filled with ``pad_fill`` when given."""
    chn = 1 if img.ndim == 2 else img.shape[2]
    if pad_fill is not None and isinstance(pad_fill, (int, float)):
        pad_fill = [pad_fill] * chn
    _bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
    scaled = bbox_scaling(_bboxes.astype(np.float32), scale).astype(
        np.int32)
    clipped = bbox_clip(scaled, img.shape[:2])
    patches = []
    for i in range(clipped.shape[0]):
        x1, y1, x2, y2 = clipped[i]
        if pad_fill is None:
            patch = img[y1:y2 + 1, x1:x2 + 1, ...]
        else:
            ox1, oy1, ox2, oy2 = scaled[i]
            patch = np.array(pad_fill, dtype=img.dtype).reshape(
                (1, 1, -1) if chn > 1 else (1, 1))
            patch = np.broadcast_to(
                patch, (oy2 - oy1 + 1, ox2 - ox1 + 1)
                + ((chn,) if chn > 1 else ())).copy()
            if chn == 1 and patch.ndim == 3:
                patch = patch[..., 0]
            ys = y1 - oy1
            xs = x1 - ox1
            patch[ys:ys + y2 - y1 + 1, xs:xs + x2 - x1 + 1, ...] = \
                img[y1:y2 + 1, x1:x2 + 1, ...]
        patches.append(patch)
    return patches[0] if bboxes.ndim == 1 else patches


def impad(img: np.ndarray, *, shape: Optional[Tuple[int, int]] = None,
          padding=None, pad_val=0, padding_mode: str = "constant"):
    """Pad to ``shape=(h, w)`` or by ``padding`` (l, t, r, b)
    (``geometric.py:490 impad``)."""
    if (shape is None) == (padding is None):
        raise ValueError("exactly one of shape and padding")
    if shape is not None:
        width = max(shape[1] - img.shape[1], 0)
        height = max(shape[0] - img.shape[0], 0)
        padding = (0, 0, width, height)
    if isinstance(padding, (int, np.integer)):
        padding = (padding, padding, padding, padding)
    elif len(padding) == 2:
        padding = (padding[0], padding[1], padding[0], padding[1])
    left, top, right, bottom = padding
    pw = ((top, bottom), (left, right)) + ((0, 0),) * (img.ndim - 2)
    if padding_mode == "constant":
        return np.pad(img, pw, mode="constant", constant_values=pad_val)
    mode = {"edge": "edge", "reflect": "reflect",
            "symmetric": "symmetric"}[padding_mode]
    return np.pad(img, pw, mode=mode)


def impad_to_multiple(img: np.ndarray, divisor: int, pad_val=0):
    """Pad h and w up to multiples of divisor (``geometric.py:573``)."""
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


def cutout(img: np.ndarray, shape, pad_val=0):
    """Randomly drop a rectangle (``geometric.py:591 cutout``)."""
    if isinstance(shape, (int, np.integer)):
        cut_h, cut_w = shape, shape
    else:
        cut_h, cut_w = shape
    h, w = img.shape[:2]
    y0 = np.random.uniform(0, h)
    x0 = np.random.uniform(0, w)
    y1 = int(max(0, y0 - cut_h / 2))
    x1 = int(max(0, x0 - cut_w / 2))
    y2 = min(h, y1 + cut_h)
    x2 = min(w, x1 + cut_w)
    chn = 1 if img.ndim == 2 else img.shape[2]
    if isinstance(pad_val, (int, float)):
        pad_val = tuple([pad_val] * chn)
    out = img.copy()
    patch = np.array(pad_val, dtype=img.dtype)
    out[y1:y2, x1:x2, ...] = patch if img.ndim == 3 else pad_val[0]
    return out


def imshear(img: np.ndarray, magnitude: float,
            direction: str = "horizontal", border_value: float = 0,
            interpolation: str = "bilinear"):
    """Shear along an axis (``geometric.py:667 imshear``)."""
    if direction == "horizontal":
        mat = np.array([[1, magnitude, 0], [0, 1, 0]], np.float64)
    elif direction == "vertical":
        mat = np.array([[1, 0, 0], [magnitude, 1, 0]], np.float64)
    else:
        raise ValueError(f"invalid direction {direction}")
    h, w = img.shape[:2]
    return _affine_warp(img, mat, h, w, border_value, interpolation)


def imtranslate(img: np.ndarray, offset: float,
                direction: str = "horizontal", border_value: float = 0,
                interpolation: str = "bilinear"):
    """Translate along an axis (``geometric.py:737 imtranslate``)."""
    if direction == "horizontal":
        mat = np.array([[1, 0, offset], [0, 1, 0]], np.float64)
    elif direction == "vertical":
        mat = np.array([[1, 0, 0], [0, 1, offset]], np.float64)
    else:
        raise ValueError(f"invalid direction {direction}")
    h, w = img.shape[:2]
    return _affine_warp(img, mat, h, w, border_value, interpolation)


# ---------------------------------------------------------------------------
# colorspace (reference: mmcv/mmcv/image/colorspace.py)
# ---------------------------------------------------------------------------

def imconvert(img: np.ndarray, src: str, dst: str) -> np.ndarray:
    """Colorspace conversion by name (``colorspace.py:8``)."""
    fn = {("bgr", "rgb"): bgr2rgb, ("rgb", "bgr"): rgb2bgr,
          ("bgr", "gray"): bgr2gray, ("rgb", "gray"): rgb2gray,
          ("gray", "bgr"): gray2bgr, ("gray", "rgb"): gray2rgb,
          ("rgb", "ycbcr"): rgb2ycbcr, ("bgr", "ycbcr"): bgr2ycbcr,
          ("ycbcr", "rgb"): ycbcr2rgb, ("ycbcr", "bgr"): ycbcr2bgr}[
              (src.lower(), dst.lower())]
    return fn(img)


def bgr2rgb(img: np.ndarray) -> np.ndarray:
    return img[..., ::-1].copy()


def rgb2bgr(img: np.ndarray) -> np.ndarray:
    return img[..., ::-1].copy()


_GRAY_W_BGR = np.array([0.114, 0.587, 0.299], np.float32)


def bgr2gray(img: np.ndarray, keepdim: bool = False) -> np.ndarray:
    """ITU-R 601 luma (``colorspace.py:24``)."""
    out = img.astype(np.float32) @ _GRAY_W_BGR
    out = out.astype(img.dtype) if img.dtype == np.uint8 else out
    return out[..., None] if keepdim else out


def rgb2gray(img: np.ndarray, keepdim: bool = False) -> np.ndarray:
    return bgr2gray(img[..., ::-1], keepdim)


def gray2bgr(img: np.ndarray) -> np.ndarray:
    img = img[..., None] if img.ndim == 2 else img
    return np.repeat(img, 3, axis=-1)


def gray2rgb(img: np.ndarray) -> np.ndarray:
    return gray2bgr(img)


def _ycbcr_fwd(img: np.ndarray, w, bias, y_only):
    dtype = img.dtype
    f = img.astype(np.float32)
    if dtype != np.uint8:
        f = f * 255.0
    if y_only:
        out = f @ w[:, 0] + bias[0]
    else:
        out = f @ w + bias
    if dtype == np.uint8:
        return out.round().astype(np.uint8)
    return out / 255.0


# ITU-R 601 studio-swing matrices (``colorspace.py:146 rgb2ycbcr``)
_YCBCR_W_RGB = np.array([[65.481, -37.797, 112.0],
                         [128.553, -74.203, -93.786],
                         [24.966, 112.0, -18.214]], np.float32) / 255.0
_YCBCR_BIAS = np.array([16.0, 128.0, 128.0], np.float32)


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    return _ycbcr_fwd(img, _YCBCR_W_RGB, _YCBCR_BIAS, y_only)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    return rgb2ycbcr(img[..., ::-1], y_only)


def _ycbcr_inv(img: np.ndarray, to: str) -> np.ndarray:
    dtype = img.dtype
    f = img.astype(np.float32)
    if dtype != np.uint8:
        f = f * 255.0
    inv = np.linalg.inv(_YCBCR_W_RGB)
    out = (f - _YCBCR_BIAS) @ inv
    if to == "bgr":
        out = out[..., ::-1]
    if dtype == np.uint8:
        return np.clip(out.round(), 0, 255).astype(np.uint8)
    return out / 255.0


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    return _ycbcr_inv(img, "rgb")


def ycbcr2bgr(img: np.ndarray) -> np.ndarray:
    return _ycbcr_inv(img, "bgr")


# ---------------------------------------------------------------------------
# photometric (reference: mmcv/mmcv/image/photometric.py)
# ---------------------------------------------------------------------------

def imnormalize(img, mean, std, to_rgb: bool = True):
    """(img - mean) / std, float32 out (``photometric.py:14``)."""
    img = np.asarray(img, np.float32)
    if to_rgb:
        img = img[..., ::-1]
    return (img - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)


def imdenormalize(img, mean, std, to_bgr: bool = True):
    out = np.asarray(img, np.float32) * np.asarray(std, np.float32) + \
        np.asarray(mean, np.float32)
    return out[..., ::-1] if to_bgr else out


def iminvert(img: np.ndarray) -> np.ndarray:
    """255 - img (``photometric.py:64``)."""
    return np.full_like(img, 255) - img


def solarize(img: np.ndarray, thr: int = 128) -> np.ndarray:
    """Invert pixels above thr (``photometric.py:76``)."""
    return np.where(img < thr, img, np.full_like(img, 255) - img)


def posterize(img: np.ndarray, bits: int) -> np.ndarray:
    """Keep top ``bits`` bits per channel (``photometric.py:90``)."""
    shift = 8 - bits
    return np.left_shift(np.right_shift(img, shift), shift)


def adjust_color(img: np.ndarray, alpha: float = 1., beta=None,
                 gamma: float = 0) -> np.ndarray:
    """Blend with its gray image (``photometric.py:105``):
    ``alpha*img + beta*gray + gamma`` (beta defaults to 1-alpha)."""
    gray = bgr2gray(img)
    gray = np.tile(gray[..., None], (1, 1, 3))
    if beta is None:
        beta = 1 - alpha
    out = img.astype(np.float32) * alpha + \
        gray.astype(np.float32) * beta + gamma
    if img.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def imequalize(img: np.ndarray) -> np.ndarray:
    """Per-channel histogram equalization, PIL.ImageOps semantics
    (``photometric.py:155 imequalize``)."""
    def _scale_channel(im):
        histo = np.histogram(im, 256, (0, 255))[0]
        nonzero = histo[histo > 0]
        if nonzero.size <= 1:
            return im.copy()
        step = (np.sum(histo) - nonzero[-1]) // 255
        if step == 0:
            return im.copy()
        lut = (np.cumsum(histo) + (step // 2)) // step
        lut = np.concatenate([[0], lut[:-1]])
        return np.clip(lut, 0, 255).astype(np.uint8)[im]

    return np.stack([_scale_channel(img[..., c])
                     for c in range(img.shape[-1])], axis=-1)


def adjust_brightness(img: np.ndarray, factor: float = 1.):
    """Blend with black (``photometric.py:200``)."""
    out = img.astype(np.float32) * factor
    if img.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def adjust_contrast(img: np.ndarray, factor: float = 1.):
    """Blend with mean-gray image (``photometric.py:250``)."""
    gray = bgr2gray(img)
    mean = round(np.mean(gray))
    out = img.astype(np.float32) * factor + mean * (1 - factor)
    if img.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def auto_contrast(img: np.ndarray, cutoff=0):
    """Per-channel remap so darkest->0, lightest->255
    (``photometric.py:298 auto_contrast``)."""
    def _auto_contrast_channel(im, c, cutoff):
        im = im[:, :, c]
        if cutoff:
            histo = np.histogram(im, 256, (0, 255))[0]
            total = np.sum(histo)
            cut_low = total * cutoff[0] // 100
            cut_high = total * cutoff[1] // 100
            cum = np.cumsum(histo)
            low = np.argwhere(cum > cut_low)
            low = 0 if low.shape[0] == 0 else low[0]
            high = np.argwhere(cum >= (total - cut_high))
            high = 255 if high.shape[0] == 0 else high[0]
        else:
            low, high = np.min(im), np.max(im)
        if low >= high:
            return im.copy()
        scale = 255.0 / (high - low)
        im = im.astype(np.float64)
        return np.clip(np.round((im - low) * scale), 0,
                       255).astype(np.uint8)

    if isinstance(cutoff, (int, float)):
        cutoff = (cutoff, cutoff)
    return np.stack([_auto_contrast_channel(img, c, cutoff)
                     for c in range(img.shape[-1])], axis=-1)


def adjust_sharpness(img: np.ndarray, factor: float = 1.,
                     kernel: Optional[np.ndarray] = None):
    """Blend with a smoothed image (``photometric.py:354``)."""
    if kernel is None:
        kernel = np.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]])
        kernel /= kernel.sum()
    h, w = img.shape[:2]
    f = img.astype(np.float32)
    if f.ndim == 2:
        f = f[..., None]
    pad = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="edge")
    smooth = np.zeros_like(f)
    for dy in range(3):
        for dx in range(3):
            smooth += kernel[dy, dx] * pad[dy:dy + h, dx:dx + w]
    out = f * factor + smooth * (1 - factor)
    if img.ndim == 2:
        out = out[..., 0]
    if img.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def lut_transform(img: np.ndarray, lut_table: np.ndarray):
    """Look-up-table transform (``photometric.py:441``)."""
    return np.asarray(lut_table, img.dtype)[img]


def adjust_hue(img: np.ndarray, hue_factor: float) -> np.ndarray:
    """Shift hue by ``hue_factor`` in [-0.5, 0.5] turns via HSV,
    PIL semantics (``photometric.py:491 adjust_hue``)."""
    if not (-0.5 <= hue_factor <= 0.5):
        raise ValueError(f"hue_factor {hue_factor} not in [-0.5, 0.5]")
    from PIL import Image
    dtype = img.dtype
    pil = Image.fromarray(img.astype(np.uint8), "RGB").convert("HSV")
    h, s, v = pil.split()
    np_h = np.asarray(h, np.uint8)
    np_h = (np_h.astype(np.int16) + int(hue_factor * 255)).astype(
        np.uint8)
    pil = Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v))
    return np.asarray(pil.convert("RGB")).astype(dtype)
