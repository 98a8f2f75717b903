"""Unit tests for bench.py's headline decision policy (VERDICT r4 weak #4 /
next #7): on persistent raw-window vs product-loop divergence the record must
fall back to the PRODUCT-loop rate (conservative), never max(...)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import resolve_headline, robust_median  # noqa: E402


def test_agreement_keeps_headline():
    value, suspect = resolve_headline(153.0, 152.2)
    assert value == 153.0 and not suspect


def test_divergence_records_product_loop_not_max():
    # raw windows above the product loop: suspect, and the LOWER product
    # number wins (the old max() policy would have kept 200)
    value, suspect = resolve_headline(200.0, 150.0)
    assert suspect and value == 150.0


def test_divergence_below_also_records_product_loop():
    # stalled raw windows below the product loop: the product number is
    # still the value (here it is also the max, but by policy not by max())
    value, suspect = resolve_headline(16.0, 153.0)
    assert suspect and value == 153.0


def test_no_product_loop_rate_passes_through():
    value, suspect = resolve_headline(153.0, None)
    assert value == 153.0 and not suspect


def test_boundary_inside_tolerance():
    value, suspect = resolve_headline(114.9, 100.0, tol=0.15)
    assert value == 114.9 and not suspect
    value, suspect = resolve_headline(116.0, 100.0, tol=0.15)
    assert suspect and value == 100.0


def test_robust_median_rejects_one_sided():
    med, rejected = robust_median([153.0, 152.0, 16.0, 154.0, 153.5])
    assert rejected == 1 and 152.0 <= med <= 154.0
