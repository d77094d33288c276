"""Shared shape arithmetic (one source — four copies drifted before r4)."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return -(-x // m) * m
