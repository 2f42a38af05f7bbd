"""Status codes and the solve-info schema.

Status integers mirror the reference's glbopts.h constants
(/root/reference/scs/py/__init__.py:16-25); the info dict reproduces the
reference extension's 21-key schema plus the 10-key aa_stats sub-dict
(/root/reference/scs/scsobject.h:1073-1107).
"""

from __future__ import annotations

INFEASIBLE_INACCURATE = -7  # best guess infeasible
UNBOUNDED_INACCURATE = -6  # best guess unbounded
SIGINT = -5  # interrupted by sig int
FAILED = -4  # solver failed
INDETERMINATE = -3  # indeterminate (norm too small)
INFEASIBLE = -2  # primal infeasible, dual unbounded
UNBOUNDED = -1  # primal unbounded, dual infeasible
UNFINISHED = 0  # never returned, placeholder
SOLVED = 1
SOLVED_INACCURATE = 2

STATUS_STRINGS = {
    SOLVED: "solved",
    SOLVED_INACCURATE: "solved_inaccurate",
    UNFINISHED: "unfinished",
    UNBOUNDED: "unbounded",
    INFEASIBLE: "infeasible",
    INDETERMINATE: "indeterminate",
    FAILED: "failed",
    SIGINT: "interrupted",
    UNBOUNDED_INACCURATE: "unbounded_inaccurate",
    INFEASIBLE_INACCURATE: "infeasible_inaccurate",
}

INFO_KEYS = (
    "status_val",
    "iter",
    "scale_updates",
    "scale",
    "pobj",
    "dobj",
    "res_pri",
    "res_dual",
    "gap",
    "res_infeas",
    "res_unbdd_a",
    "res_unbdd_p",
    "comp_slack",
    "solve_time",
    "setup_time",
    "lin_sys_time",
    "cone_time",
    "accel_time",
    "rejected_accel_steps",
    "accepted_accel_steps",
    "status",
)

AA_STATS_KEYS = (
    "iter",
    "n_accept",
    "n_reject_lapack",
    "n_reject_rank0",
    "n_reject_nonfinite",
    "n_reject_weight_cap",
    "n_safeguard_reject",
    "last_rank",
    "last_aa_norm",
    "last_regularization",
)


def default_aa_stats() -> dict:
    """AA-off behavior: all-zero counters + NaN last_aa_norm
    (reference: test_scs_coverage.py:1320-1330)."""
    stats = {k: 0 for k in AA_STATS_KEYS}
    stats["last_aa_norm"] = float("nan")
    stats["last_regularization"] = 0.0
    return stats


def make_info(
    status_val: int,
    iters: int,
    *,
    scale_updates: int = 0,
    scale: float = 0.0,
    pobj: float = float("nan"),
    dobj: float = float("nan"),
    res_pri: float = float("nan"),
    res_dual: float = float("nan"),
    gap: float = float("nan"),
    res_infeas: float = float("nan"),
    res_unbdd_a: float = float("nan"),
    res_unbdd_p: float = float("nan"),
    comp_slack: float = float("nan"),
    solve_time: float = 0.0,
    setup_time: float = 0.0,
    lin_sys_time: float = 0.0,
    cone_time: float = 0.0,
    accel_time: float = 0.0,
    rejected_accel_steps: int = 0,
    accepted_accel_steps: int = 0,
    aa_stats: dict | None = None,
) -> dict:
    info = {
        "status_val": int(status_val),
        "iter": int(iters),
        "scale_updates": int(scale_updates),
        "scale": float(scale),
        "pobj": float(pobj),
        "dobj": float(dobj),
        "res_pri": float(res_pri),
        "res_dual": float(res_dual),
        "gap": float(gap),
        "res_infeas": float(res_infeas),
        "res_unbdd_a": float(res_unbdd_a),
        "res_unbdd_p": float(res_unbdd_p),
        "comp_slack": float(comp_slack),
        "solve_time": float(solve_time),
        "setup_time": float(setup_time),
        "lin_sys_time": float(lin_sys_time),
        "cone_time": float(cone_time),
        "accel_time": float(accel_time),
        "rejected_accel_steps": int(rejected_accel_steps),
        "accepted_accel_steps": int(accepted_accel_steps),
        "status": STATUS_STRINGS.get(int(status_val), "unknown"),
    }
    info["aa_stats"] = aa_stats if aa_stats is not None else default_aa_stats()
    return info
