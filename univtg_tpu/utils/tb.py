"""Optional TensorBoard scalar logging.

The reference logs train/eval scalars through torch's SummaryWriter
(main/train_mr.py:76-95); here a thin tf.summary wrapper does the same when
TensorFlow is importable, and degrades to a no-op otherwise. The jsonl logs
remain the source of truth.
"""
from __future__ import annotations

from typing import Optional


class TBWriter:
    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if not log_dir:
            return
        try:
            import tensorflow as tf

            self._writer = tf.summary.create_file_writer(log_dir)
        except ImportError:
            self._writer = None

    @property
    def active(self) -> bool:
        return self._writer is not None

    def scalars(self, tag_values: dict, step: int, prefix: str = ""):
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            for tag, value in tag_values.items():
                try:
                    tf.summary.scalar(f"{prefix}{tag}", float(value), step=step)
                except (TypeError, ValueError):
                    continue
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
