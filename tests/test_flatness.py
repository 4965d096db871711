"""Pins for the soak/probe latency-flatness computation
(tools/flatness.thirds_flatness — the function whose verdict gates
SOAK_STREAM.json and SCALE_PROBE.json's `latency_flat`).

The r10 verdict's polish item: the depth-96 soak's flatness check lived
inline in the tools, untested. It is now a pure function pinned here
against a RECORDED real trace (the r11 depth-96 batched-runner soak,
10k keys × 96 stages, which must read flat) and against synthetic
growth traces that model the failure the check exists to catch — the
pre-r10 runner's per-batch cost growing with history depth."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from flatness import thirds_flatness  # noqa: E402

# Recorded trace: SOAK_STREAM.json `durable_batched_deep` (r11 run) —
# per-batch merge+emit+swap seconds for 96 micro-batches of the
# bucketed refeed runner. Batch cost is O(keys), so the trace is flat
# modulo host noise; the leading batches carry JIT warmup.
DEPTH96_TRACE = [
    1.215, 0.975, 0.816, 0.896, 0.881, 0.814, 0.799, 0.799, 0.826, 0.771,
    0.795, 0.802, 0.829, 0.92, 0.89, 0.922, 0.991, 0.944, 0.897, 0.874,
    0.909, 1.034, 0.779, 0.91, 0.874, 0.852, 0.826, 0.914, 0.952, 0.919,
    0.937, 0.93, 0.955, 0.849, 0.865, 0.859, 0.811, 0.83, 0.822, 0.821,
    0.826, 0.855, 0.906, 0.86, 0.827, 0.822, 0.788, 0.808, 0.904, 0.792,
    0.808, 0.825, 0.768, 0.762, 0.778, 0.818, 0.83, 0.759, 0.816, 0.78,
    0.76, 0.835, 0.875, 0.804, 0.757, 0.821, 0.751, 0.803, 0.765, 0.773,
    0.754, 0.773, 0.745, 0.744, 0.876, 0.931, 0.946, 0.865, 0.865, 0.888,
    0.75, 0.81, 0.819, 0.821, 0.76, 0.771, 0.756, 0.762, 0.765, 0.872,
    0.854, 0.806, 0.851, 0.902, 0.875, 0.846,
]


def test_recorded_depth96_trace_is_flat():
    r = thirds_flatness(DEPTH96_TRACE)
    assert r["latency_flat"]
    # and comfortably so — late third within 10% of early, not just 50%
    assert r["batch_s_late3rd"] <= 1.1 * r["batch_s_early3rd"]


def test_linear_growth_fails():
    # the O(batches²)-lifetime shape: each batch re-reads all history,
    # so per-batch seconds grow linearly in batch index
    trace = [0.5 + 0.05 * i for i in range(96)]
    assert not thirds_flatness(trace)["latency_flat"]


def test_mild_drift_within_ratio_passes():
    # +20% end-to-end drift (host noise scale) stays under the 1.5× gate
    trace = [1.0 + 0.2 * i / 95 for i in range(96)]
    assert thirds_flatness(trace)["latency_flat"]


def test_warmup_head_is_excluded():
    # two slow JIT batches then flat: the warmup skip must not let the
    # head inflate the early third into masking a late regression...
    flat_after_warmup = [3.0, 2.0] + [0.8] * 30
    r = thirds_flatness(flat_after_warmup)
    assert r["latency_flat"]
    assert r["batch_s_early3rd"] <= 0.81  # head really excluded
    # ...and a trace that only LOOKS flat because of a slow head (late
    # half regressed vs the true post-warmup floor) must still fail
    regressed = [3.0, 2.0] + [0.5] * 15 + [1.0] * 15
    assert not thirds_flatness(regressed)["latency_flat"]


def test_short_traces_compare_raw_thirds():
    assert thirds_flatness([0.5] * 4)["latency_flat"]
    assert not thirds_flatness([0.5, 0.5, 0.5, 2.0])["latency_flat"]
    # single batch: early == late, trivially flat
    assert thirds_flatness([1.0])["latency_flat"]
