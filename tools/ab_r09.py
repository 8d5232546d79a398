#!/usr/bin/env python
"""Interleaved A/B harness (session 2): run N alternating rounds of two
or more DataFrame builders in ONE session and report per-variant medians.
Host-noise-resistant: variants alternate A,B,A,B,... so drift hits all
variants equally.

Usage: importable only — write a small driver that calls run_ab().
"""

from __future__ import annotations

import statistics
import time


def run_ab(spark, variants: dict, rounds: int = 7, warmups: int = 1):
    """variants: name -> zero-arg builder returning a DataFrame."""
    names = list(variants)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for n in names:  # warm-up each variant (codegen, workers)
        for _ in range(warmups):
            spark.catalog.clearCache()
            variants[n]().write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for n in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            variants[n]().write.format("noop").mode("overwrite").save()
            samples[n].append(time.perf_counter() - t0)
    out = {}
    for n in names:
        s = sorted(samples[n])
        out[n] = {
            "median": round(statistics.median(s), 3),
            "mean": round(statistics.fmean(s), 3),
            "samples": [round(x, 3) for x in samples[n]],
        }
    return out
