"""LR-schedule trajectory + logger/LogBuffer tests — the rebuild's
counterpart of mmcv's hook tests (``mmcv/tests/test_runner/
test_hooks.py:1268 test_step_runner_hook`` asserts exact LR values per
iteration; logger hooks are asserted via recorded calls)."""
import json
import os

import numpy as np

from sm3det_tpu.train.loggers import TextLogger, build_loggers
from sm3det_tpu.train.loop import LogBuffer
from sm3det_tpu.train.optim import step_lr


def test_step_lr_trajectory_matches_mmcv_semantics():
    # warmup 4 iters at ratio 1/3, steps at 8 and 12, gamma 0.1
    sched = step_lr(base_lr=0.02, step_iters=(8, 12), gamma=0.1,
                    warmup_iters=4, warmup_ratio=1.0 / 3.0)
    got = [float(sched(np.int32(i))) for i in range(14)]
    # mmcv get_warmup_lr: lr * (1 - (1 - i/w) * (1 - ratio))
    expect = []
    for i in range(14):
        lr = 0.02 * (0.1 ** ((i >= 8) + (i >= 12)))
        if i < 4:
            k = (1 - i / 4) * (1 - 1 / 3)
            lr = lr * (1 - k)
        expect.append(lr)
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # spot values: iter0 = base/3, warmup end = base, post-step = base/10
    assert abs(got[0] - 0.02 / 3) < 1e-8
    assert abs(got[4] - 0.02) < 1e-8
    assert abs(got[8] - 0.002) < 1e-8
    assert abs(got[12] - 0.0002) < 1e-9


def test_log_buffer_windowed_means():
    buf = LogBuffer(window=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        buf.update({"loss": v})
    # window 3 -> mean of last three
    assert abs(buf.averages()["loss"] - 3.0) < 1e-9


def test_text_logger_jsonl(tmp_path):
    lg = TextLogger(str(tmp_path))
    lg.log({"loss": 1.5, "lr": 0.01}, step=7)
    lg.log({"loss": 1.25}, step=8)
    lg.close()
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert files
    lines = [json.loads(line) for line in
             open(os.path.join(tmp_path, files[0]))]
    assert lines[0]["iter"] == 7 and lines[0]["loss"] == 1.5
    assert lines[1]["iter"] == 8


def test_build_loggers_text_only(tmp_path):
    logs = build_loggers(["text"], str(tmp_path))
    assert len(logs) == 1
    logs[0].log({"a": 1.0}, step=0)
    for lg in logs:
        lg.close()
