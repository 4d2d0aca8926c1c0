"""Vectorized delayed-delivery tracker: behavior + big-backlog time budget
(VERDICT r4 item 6; reference BucketDelayedDeliveryTracker handles huge
pending backlogs — the state op must be column-vectorized, not per-row)."""

import time

import numpy as np
import pandas as pd

from pulsar_3_2_codedump_spark.streaming.delayed import _release


class FakeState:
    """Minimal GroupState stand-in for driving _release directly."""

    def __init__(self, wm_ms=0, value=None):
        self._wm_ms = wm_ms
        self._value = value
        self.removed = False
        self.timeout = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def update(self, v):
        self._value = v

    def remove(self):
        self._value, self.removed = None, True

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout = ts_ms


def _batch(n, start_us=1_700_000_000_000_000, step_us=1_000_000):
    due = pd.to_datetime(np.arange(n, dtype=np.int64) * step_us + start_us, unit="us")
    return pd.DataFrame(
        {
            "partition": np.zeros(n, dtype=np.int32),
            "key": [f"k{i}" for i in range(n)],
            "sequence_id": np.arange(n, dtype=np.int64),
            "publish_time": due - pd.Timedelta(seconds=5),
            "deliver_at": due,
        }
    )


def test_release_splits_due_and_pending():
    pdf = _batch(100)
    wm_us = int(pdf["deliver_at"].iloc[49].value // 1000)  # first 50 due
    state = FakeState(wm_ms=wm_us // 1000)
    out = list(_release(("0",), iter([pdf]), state))
    assert len(out) == 1 and len(out[0]) == 50
    assert set(out[0]["sequence_id"]) == set(range(50))
    keys, seqs, dues = state.get
    assert len(keys) == 50 and min(seqs) == 50
    assert state.timeout == min(dues) // 1000 + 1
    # next watermark advance releases the rest from stored state
    state2 = FakeState(wm_ms=max(state.get[2]) // 1000 + 1000, value=state.get)
    out2 = list(_release(("0",), iter([]), state2))
    assert len(out2[0]) == 50 and state2.removed


def test_release_null_deliver_at_uses_publish_time():
    pdf = _batch(10)
    pdf.loc[:4, "deliver_at"] = pd.NaT  # immediate rows
    wm_us = int(pdf["publish_time"].iloc[9].value // 1000)
    out = list(_release(("3",), iter([pdf]), FakeState(wm_ms=wm_us // 1000)))
    released = out[0]
    assert (released["partition"] == 3).all()
    # all publish_times <= wm → the 5 immediate rows all released
    assert set(released["sequence_id"]) >= set(range(5))


def test_backlog_100k_under_budget():
    pdf = _batch(100_000)
    wm_us = int(pdf["deliver_at"].iloc[59_999].value // 1000)
    state = FakeState(wm_ms=wm_us // 1000)
    t0 = time.monotonic()
    out = list(_release(("0",), iter([pdf]), state))
    elapsed = time.monotonic() - t0
    assert len(out[0]) == 60_000 and len(state.get[0]) == 40_000
    assert elapsed < 2.0, f"vectorized release took {elapsed:.2f}s for 100k rows"
