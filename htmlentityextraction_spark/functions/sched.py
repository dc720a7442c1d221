"""Scheduler helpers (SURVEY.md §2.8 F17, §2.10 T8).

The reference's FillSeedsByProdFreq polls Cassandra every gcd-derived
tick and re-enqueues products whose update_window divides the tick
(`streaming/FillSeedsByProdFreq.scala:38-71`); the gcd/lcm reduction
lives at `utils/Utils.scala:434-440`. These are driver-side trigger
calculations — plain Python, no Spark.
"""

from __future__ import annotations

from math import gcd


def gcd_all(xs: list[int]) -> int:
    out = 0
    for x in xs:
        out = gcd(out, x)
    return out


def lcm_all(xs: list[int]) -> int:
    out = 1
    for x in xs:
        out = out * x // gcd(out, x)
    return out


def scheduler_period(update_windows: list[int]) -> tuple[int, int]:
    """(tick, cycle): poll every gcd of the windows; the schedule
    repeats after their lcm."""
    return gcd_all(update_windows), lcm_all(update_windows)
