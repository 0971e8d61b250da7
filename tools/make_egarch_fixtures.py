"""Generate the committed EGARCH golden fixtures (VERDICT r3 #5).

Simulates exact EGARCH(1,1) level series with known coefficients and
records, per fixture: the series itself (parquet), the true
data-generating parameters, and the parameters the CURRENT estimator
recovers (the golden pin). Committing series + golden values makes the
numeric pin byte-reproducible across numpy/scipy upgrades: the
recovery test reads the parquet instead of re-simulating, so an RNG or
optimizer behavior change shows up as an explicit test diff, not a
silently different fixture.

Run from the repo root: ``python tools/make_egarch_fixtures.py``.
Outputs land in ``tests/fixtures/egarch/``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gapless_deribit_clickhouse_spark.features.egarch import E_ABS_Z, fit_egarch

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "egarch",
)

FIXTURES = {
    "recovery": dict(
        n=2000, seed=7, mu=0.05, omega=0.1, alpha=0.25, gamma=-0.12, beta=0.9
    ),
    "leverage_neg": dict(
        n=1500, seed=13, mu=0.0, omega=0.05, alpha=0.2, gamma=-0.15, beta=0.85
    ),
    "leverage_pos": dict(
        n=1500, seed=13, mu=0.0, omega=0.05, alpha=0.2, gamma=0.15, beta=0.85
    ),
}


def simulate(n, mu, omega, alpha, gamma, beta, seed):
    """Exact EGARCH(1,1) DGP (normal innovations): returns the level
    series whose 100*dlog returns follow the process, plus the true
    conditional-volatility path."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal(n)
    lh = omega / (1.0 - beta)
    zprev = 0.0
    rs = np.empty(n)
    sig = np.empty(n)
    for t in range(n):
        if t:
            lh = omega + alpha * (abs(zprev) - E_ABS_Z) + gamma * zprev + beta * lh
        sig[t] = np.exp(0.5 * lh)
        rs[t] = mu + z[t] * sig[t]
        zprev = z[t]
    levels = np.concatenate([[1.0], np.exp(np.cumsum(rs) / 100.0)])
    return levels, sig


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    golden = {}
    for name, spec in FIXTURES.items():
        params = {k: v for k, v in spec.items() if k not in ("n", "seed")}
        levels, sig = simulate(**spec)
        pdf = pd.DataFrame(
            {
                "t": np.arange(len(levels), dtype="int64"),
                "level": levels,
                # true sigma applies to returns: one fewer than levels
                "true_sigma": np.concatenate([[np.nan], sig]),
            }
        )
        pdf.to_parquet(os.path.join(OUT_DIR, f"{name}.parquet"), index=False)
        res = fit_egarch(pd.Series(levels))
        golden[name] = {
            "true": params,
            "n": spec["n"],
            "seed": spec["seed"],
            "fitted": {k: float(v) for k, v in res.params.items()},
            "loglik": float(res.loglik),
            "scale_factor": float(res.scale_factor),
        }
    with open(os.path.join(OUT_DIR, "golden.json"), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {len(FIXTURES)} fixtures + golden.json to {OUT_DIR}")


if __name__ == "__main__":
    main()
