"""Native host-geometry library: auto-build + correctness vs jnp ops.

The .so is built on demand from ``native/rotated_geometry.cc`` (atomic
temp-file rename), so a truncated library from an interrupted build
must self-heal on next use. Reference semantics:
mmcv/mmcv/ops/csrc/common/box_iou_rotated_utils.hpp (polygon-clip IoU),
mmcv/mmcv/ops/csrc/pytorch/nms_rotated.cpp (greedy keep).
"""

import os

import numpy as np
import pytest

import sm3det_tpu.native as native
from sm3det_tpu.native import box_iou_rotated_native, nms_rotated_native

SO = os.path.join(os.path.dirname(native.__file__),
                  "libsm3det_geometry.so")


def _reset_load_state():
    native._LIB = None
    native._LOAD_FAILED = False


def _run_fresh(code: str):
    # Auto-build scenarios must run in a fresh process: dlopen caches
    # by pathname, so a lib already loaded by an earlier test in THIS
    # process masks the missing/corrupt file; and in-place overwrite
    # would corrupt live mappings (bus error).
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], check=True, timeout=180,
                   cwd=os.path.dirname(os.path.dirname(__file__)), env=env)
    _reset_load_state()


_CHECK = (
    "import numpy as np\n"
    "from sm3det_tpu.native import box_iou_rotated_native\n"
    "b = np.array([[1.0, 2.0, 6.0, 3.0, 0.5]], np.float32)\n"
    "iou = box_iou_rotated_native(b, b)\n"
    "assert iou is not None and abs(float(iou[0, 0]) - 1.0) < 1e-5\n"
    f"import os; assert os.path.exists({SO!r})\n"
)


def test_autobuild_from_missing():
    _run_fresh(
        "import os\n"
        f"if os.path.exists({SO!r}): os.unlink({SO!r})\n" + _CHECK)


def test_autobuild_heals_truncated_so():
    # Replace via a new inode (os.replace), NOT in-place truncation:
    # other processes (this pytest run) may have the old .so mmap'd.
    _run_fresh(
        "import os\n"
        f"tmp = {SO!r} + '.garbage'\n"
        "open(tmp, 'wb').write(b'not an elf')\n"
        f"os.replace(tmp, {SO!r})\n" + _CHECK)


def test_native_matches_jnp_iou():
    _reset_load_state()
    rng = np.random.RandomState(0)
    n = 32
    boxes1 = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                       rng.uniform(2, 8, n), rng.uniform(2, 8, n),
                       rng.uniform(-1.5, 1.5, n)], axis=1).astype(np.float32)
    boxes2 = boxes1 + rng.uniform(-1, 1, (n, 5)).astype(np.float32)
    boxes2[:, 2:4] = np.abs(boxes2[:, 2:4]) + 1.0
    got = box_iou_rotated_native(boxes1, boxes2)
    if got is None:
        pytest.skip("native lib unavailable (no g++)")
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated
    want = np.asarray(box_iou_rotated(boxes1, boxes2))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_native_nms_matches_greedy():
    _reset_load_state()
    boxes = np.array([[0, 0, 4, 4, 0], [0.2, 0, 4, 4, 0],
                      [10, 10, 4, 4, 0.7], [10.1, 10, 4, 4, 0.7]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95], np.float32)
    keep = nms_rotated_native(boxes, scores, 0.5)
    if keep is None:
        pytest.skip("native lib unavailable (no g++)")
    assert sorted(keep.tolist()) == [0, 3]
