"""Logger backends (mmcv ``runner/hooks/logger/`` capability): text/jsonl
is built into the loop; TensorBoard and Weights&Biases attach here when
their packages exist (gated imports — the reference ships 9 logger hooks,
all optional)."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class TextLogger:
    """Console + <work_dir>/train_log.jsonl (TextLoggerHook parity —
    already the loop default; kept for explicit composition)."""

    def __init__(self, work_dir: str):
        self.path = os.path.join(work_dir, "train_log.jsonl")
        os.makedirs(work_dir, exist_ok=True)

    def log(self, metrics: Dict[str, float], step: int):
        line = {"iter": step, **metrics}
        print(json.dumps(line))
        with open(self.path, "a") as f:
            f.write(json.dumps(line) + "\n")

    def close(self):
        pass


class TensorBoardLogger:
    """TensorboardLoggerHook parity (requires tensorboardX or tf)."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "tensorboard unavailable; use TextLogger") from e
        self.writer = SummaryWriter(log_dir)

    def log(self, metrics: Dict[str, float], step: int):
        for k, v in metrics.items():
            self.writer.add_scalar(k, v, step)

    def close(self):
        self.writer.close()


class WandbLogger:
    """WandbLoggerHook parity (requires wandb)."""

    def __init__(self, project: str, name: Optional[str] = None, **kw):
        import wandb  # noqa  (gated)
        self.run = wandb.init(project=project, name=name, **kw)

    def log(self, metrics: Dict[str, float], step: int):
        self.run.log(metrics, step=step)

    def close(self):
        self.run.finish()


def build_loggers(cfg_list, work_dir: str):
    """['text', 'tensorboard', ...] -> logger objects (skip unavailable)."""
    out = []
    for item in cfg_list or ["text"]:
        try:
            if item == "text":
                out.append(TextLogger(work_dir))
            elif item == "tensorboard":
                out.append(TensorBoardLogger(
                    os.path.join(work_dir, "tb")))
            elif item == "wandb":
                out.append(WandbLogger(project="sm3det_tpu"))
        except ImportError:
            print(f"logger {item!r} unavailable; skipped")
    return out
