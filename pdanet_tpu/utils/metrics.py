"""Training metrics sink — counterpart of the reference's tensorboardX
scalars (train_utils.py:89-93, test.py:129-131).

Primary sink is an append-only JSONL file (robust, dependency-free,
greppable); a tensorboard event file is written too when a SummaryWriter
implementation is importable."""

import json
import time
from pathlib import Path


class MetricsLogger:
    #: when False the train loop only flushes scalars on its (sparse)
    #: logging iterations, avoiding a host-device sync every step
    every_iter = True

    def __init__(self, log_dir, every_iter=True):
        self.every_iter = every_iter
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.log_dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        for mod, cls in (
            ("tensorboardX", "SummaryWriter"),
            ("torch.utils.tensorboard", "SummaryWriter"),
        ):
            try:
                import importlib

                writer = getattr(importlib.import_module(mod), cls)
                self._tb = writer(log_dir=str(self.log_dir))
                break
            except Exception:
                continue

    def add_scalar(self, tag, value, step):
        self._f.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}
            )
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
