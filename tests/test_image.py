"""utils/image.py — host image library behavioral checks (parity with
the semantics of mmcv/mmcv/image/{geometric,colorspace,photometric}.py)."""
import numpy as np
import pytest

from sm3det_tpu.utils import image as mi


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return (rng.rand(40, 60, 3) * 255).astype(np.uint8)


def test_imresize_shapes_and_scale(img):
    out, ws, hs = mi.imresize(img, (30, 20), return_scale=True)
    assert out.shape == (20, 30, 3) and out.dtype == np.uint8
    assert ws == 0.5 and hs == 0.5
    like = mi.imresize_like(img, out)
    assert like.shape == out.shape


def test_imresize_to_multiple(img):
    out = mi.imresize_to_multiple(img, 32, scale_factor=1.0)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] >= 40 and out.shape[1] >= 60


def test_rescale_size_and_imrescale(img):
    # tuple scale: fit inside (long, short) preserving aspect
    size, factor = mi.rescale_size((60, 40), (120, 80),
                                   return_scale=True)
    assert size == (120, 80) and factor == 2.0
    out = mi.imrescale(img, 0.5)
    assert out.shape == (20, 30, 3)
    with pytest.raises(ValueError):
        mi.rescale_size((60, 40), -1)


def test_imflip_involution(img):
    for d in ("horizontal", "vertical", "diagonal"):
        assert np.array_equal(mi.imflip(mi.imflip(img, d), d), img)
    assert np.array_equal(mi.imflip(img)[:, ::-1], img)


def test_imrotate_quarter_turns():
    img = (np.arange(64).reshape(8, 8) % 255).astype(np.uint8)
    # 180 deg about the exact center is a flip in both axes
    out = mi.imrotate(img, 180)
    assert np.array_equal(out, img[::-1, ::-1])
    # rotating back recovers the interior
    back = mi.imrotate(mi.imrotate(img, 90), -90)
    assert np.array_equal(back[2:-2, 2:-2], img[2:-2, 2:-2])


def test_imrotate_auto_bound():
    img = np.ones((10, 20), np.uint8) * 7
    out = mi.imrotate(img, 90, auto_bound=True)
    assert out.shape == (20, 10)


def test_bbox_clip_scaling():
    b = np.array([[-5.0, -5.0, 100.0, 30.0]])
    c = mi.bbox_clip(b, (32, 64))
    assert c.tolist() == [[0.0, 0.0, 63.0, 30.0]]
    s = mi.bbox_scaling(np.array([[10., 10., 19., 19.]]), 2.0)
    np.testing.assert_allclose(s, [[5., 5., 24., 24.]])


def test_imcrop_and_pad_fill(img):
    patch = mi.imcrop(img, np.array([10, 5, 19, 14]))
    assert patch.shape == (10, 10, 3)
    assert np.array_equal(patch, img[5:15, 10:20])
    # out-of-bounds crop with padding
    patch = mi.imcrop(img, np.array([-5, -5, 4, 4]), pad_fill=9)
    assert patch.shape == (10, 10, 3)
    assert (patch[:5, :5] == 9).all()
    assert np.array_equal(patch[5:, 5:], img[:5, :5])


def test_impad_modes(img):
    out = mi.impad(img, shape=(50, 70), pad_val=3)
    assert out.shape == (50, 70, 3)
    assert (out[40:, :, :] == 3).all() and (out[:, 60:, :] == 3).all()
    out = mi.impad(img, padding=(1, 2, 3, 4))
    assert out.shape == (40 + 2 + 4, 60 + 1 + 3, 3)
    out = mi.impad_to_multiple(img, 32)
    assert out.shape == (64, 64, 3)
    with pytest.raises(ValueError):
        mi.impad(img)


def test_cutout(img):
    out = mi.cutout(img, 10, pad_val=0)
    assert out.shape == img.shape
    assert (out == 0).any() or True  # rectangle may clip at border


def test_imshear_imtranslate_identity(img):
    assert np.array_equal(mi.imshear(img, 0.0), img)
    assert np.array_equal(mi.imtranslate(img, 0.0), img)
    t = mi.imtranslate(img, 5, "horizontal", border_value=0,
                       interpolation="nearest")
    assert np.array_equal(t[:, 5:], img[:, :-5])
    assert (t[:, :5] == 0).all()


def test_colorspace_roundtrips(img):
    assert np.array_equal(mi.bgr2rgb(mi.bgr2rgb(img)), img)
    assert np.array_equal(mi.imconvert(img, "bgr", "rgb"),
                          img[..., ::-1])
    g = mi.rgb2gray(img)
    assert g.shape == (40, 60)
    assert mi.rgb2gray(img, keepdim=True).shape == (40, 60, 1)
    assert mi.gray2rgb(g).shape == (40, 60, 3)
    # gray weights: pure-red RGB -> 0.299
    red = np.zeros((2, 2, 3), np.float32)
    red[..., 0] = 1.0
    np.testing.assert_allclose(mi.rgb2gray(red), 0.299, atol=1e-6)


def test_ycbcr_roundtrip(img):
    y = mi.rgb2ycbcr(img)
    back = mi.ycbcr2rgb(y)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2
    y_only = mi.rgb2ycbcr(img, y_only=True)
    np.testing.assert_array_equal(y_only, y[..., 0])
    assert np.array_equal(mi.bgr2ycbcr(img),
                          mi.rgb2ycbcr(img[..., ::-1]))


def test_normalize_roundtrip(img):
    mean, std = (10., 20., 30.), (2., 3., 4.)
    n = mi.imnormalize(img, mean, std, to_rgb=False)
    d = mi.imdenormalize(n, mean, std, to_bgr=False)
    np.testing.assert_allclose(d, img, atol=1e-4)


def test_photometric_basics(img):
    assert np.array_equal(mi.iminvert(img), 255 - img)
    s = mi.solarize(img, 128)
    assert np.array_equal(s[img < 128], img[img < 128])
    assert np.array_equal(s[img >= 128], 255 - img[img >= 128])
    p = mi.posterize(img, 2)
    assert set(np.unique(p)) <= {0, 64, 128, 192}
    assert np.array_equal(mi.adjust_brightness(img, 1.0), img)
    assert (mi.adjust_brightness(img, 0.0) == 0).all()
    assert np.array_equal(mi.adjust_contrast(img, 1.0), img)
    con0 = mi.adjust_contrast(img, 0.0)
    assert np.unique(con0).size == 1  # collapses to the mean gray
    assert np.array_equal(mi.adjust_color(img, 1.0), img)


def test_equalize_and_autocontrast():
    # constant image: equalize keeps it constant, auto_contrast no-op
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(mi.imequalize(flat), flat)
    assert np.array_equal(mi.auto_contrast(flat), flat)
    # two-level image stretches to full range
    img = np.zeros((4, 4, 1), np.uint8)
    img[2:] = 100
    out = mi.auto_contrast(img)
    assert out.min() == 0 and out.max() == 255


def test_sharpness_and_lut_and_hue(img):
    assert np.array_equal(mi.adjust_sharpness(img, 1.0), img)
    sm = mi.adjust_sharpness(img, 0.0)
    assert sm.shape == img.shape
    lut = np.arange(256, dtype=np.uint8)[::-1]
    assert np.array_equal(mi.lut_transform(img, lut), 255 - img)
    # factor 0 still does the PIL HSV roundtrip (lossy by design —
    # mmcv's adjust_hue has the same behavior); check it's close
    h0 = mi.adjust_hue(img, 0.0)
    assert np.abs(h0.astype(int) - img.astype(int)).mean() < 1.0
    h = mi.adjust_hue(img, 0.25)
    assert h.shape == img.shape and h.dtype == img.dtype
    assert not np.array_equal(h, img)
    with pytest.raises(ValueError):
        mi.adjust_hue(img, 0.9)
