"""Statistical tails used by the distance / screen / bounds commands.

Parity targets (GSL calls in the reference):

* ``binom_sf(x-1, n, r)`` == ``gsl_cdf_binomial_Q(x-1, r, n)`` — Mash
  distance p-value (CommandDistance.cpp:433-450) and screen's
  ``pValueWithin`` (CommandScreen.cpp:386-406).
* ``chisq_sf(x, 1)`` == ``gsl_cdf_chisq_Q(x, 1)`` — the fingerprint
  triangle p-value (CommandTriangle.cpp:297).
* ``binom_cdf`` — the error-bound table (CommandBounds.cpp:148-170).

Both GSL and SciPy route these through the regularized incomplete beta /
gamma functions, giving agreement at full double precision even in the
extreme tails the goldens exercise (e.g. 4.48626e-214).
"""

from __future__ import annotations

import math


def binom_sf(k: int, n: int, p: float) -> float:
    """P(X > k) for X ~ Binomial(n, p) — i.e. gsl_cdf_binomial_Q(k, p, n)."""
    if n <= 0 or p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0 if k < n else 0.0
    if k < 0:
        return 1.0
    if k >= n:
        return 0.0
    from scipy.stats import binom

    return float(binom.sf(k, n, p))


def binom_cdf(k: int, n: int, p: float) -> float:
    """P(X <= k) — gsl_cdf_binomial_P(k, p, n)."""
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    if p <= 0.0:
        return 1.0
    if p >= 1.0:
        return 0.0
    from scipy.stats import binom

    return float(binom.cdf(k, n, p))


def chisq_sf(x: float, df: float = 1.0) -> float:
    """P(X > x) for chi-square — gsl_cdf_chisq_Q(x, df)."""
    from scipy.stats import chi2

    return float(chi2.sf(x, df))


def mash_pvalue(
    common: int, length_ref: int, length_query: int, kmer_space: float, sketch_size: int
) -> float:
    """Binomial p-value for observing ``common`` shared min-hashes by chance
    (CommandDistance.cpp:433-450 ``pValue``)."""
    if common == 0:
        return 1.0
    px = 1.0 / (1.0 + kmer_space / length_ref)
    py = 1.0 / (1.0 + kmer_space / length_query)
    r = px * py / (px + py - px * py)
    return binom_sf(common - 1, sketch_size, r)


def screen_pvalue(common: int, set_size: int, kmer_space: float, sketch_size: int) -> float:
    """`pValueWithin` (CommandScreen.cpp:386-406)."""
    if common == 0:
        return 1.0
    r = float(set_size) / kmer_space
    r = max(0.0, min(1.0, r))
    return binom_sf(common - 1, sketch_size, r)


def format_g(x: float) -> str:
    """C++ ``cout << double`` default formatting (6 significant digits)."""
    return f"{x:g}"
