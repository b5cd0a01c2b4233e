"""Cross-engine rounding policy — the single home of the half-tie nudges.

Contract-query float columns are rounded identically on the Spark side and
in the DuckDB oracle SQL. Values derived from 2-decimal inputs are DECIMAL
rationals that frequently sit exactly on a rounding boundary, where the two
engines' ~1e-12..3e-10 float disagreement (different summation orders and
moment algebras) splits the rounded digit. The guard is a DYADIC nudge
added before ROUND on BOTH engines: it moves the effective boundary from
``tie`` to ``tie - 2^-k``, a point whose decimal expansion needs k digits
(2^-33 = 5^33/10^33) — unreachable by the contract values' bounded-digit
lattices — while staying far above the cross-engine error and far below
the rounding quantum.

Use ``NUDGE_4DP`` for 4-decimal roundings of large-magnitude values
(variance-class, error up to ~3e-10) and ``NUDGE_6DP`` for 6-decimal
averages / ratios / distances and 3-decimal sums (error ~1e-12). Interpolate
``{NUDGE_xDP!r}`` into oracle f-strings so the SQL literal is bit-identical
to the Spark-side ``F.lit`` (both spellings round-trip exactly through
float64).
"""

NUDGE_4DP = 2.0**-26  # 1.4901161193847656e-08
NUDGE_6DP = 2.0**-33  # 1.1641532182693481e-10

assert repr(NUDGE_4DP) == "1.4901161193847656e-08"
assert repr(NUDGE_6DP) == "1.1641532182693481e-10"
