"""Command-line drivers: solve one problem, or batch-run a list.

TPU-native equivalents of GALAHAD's L4/L5 operational layer:
  * ``solve``  — the per-package USE_<pkg> drivers + ``gal`` run script
    (reference src/cqp/usecqp.f90:52: read problem, read specfile,
    optional scale/presolve, solve, report, write solution file;
    bin/gal:7).
  * ``batch``  — the ``galtests`` batch tester (reference
    bin/galtests:1-13: run a solver over a list of problems, append one
    result line per problem to <PKG>RES.d).

Input format is QPLIB (io/qplib.py — the RPD format, reference
src/rpd/rpd.f90); specfiles use the GALAHAD keyword syntax
(core/config.py).  Usage:

    python -m galahad_tpu solve problem.qplib [--solver cqp]
        [--spec RUNCQP.SPC] [--scale] [--presolve]
        [--solution-file out.txt] [--json]
    python -m galahad_tpu batch list.txt [--solver cqp] [--out RES.d]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _build_control(args):
    from .qp.frontend import QPControl
    from .core.config import apply_specfile, read_specfile

    ctl = QPControl(quadratic_programming_solver=args.solver,
                    scale=1 if args.scale else 0,
                    presolve_problem=bool(args.presolve))
    if args.spec:
        import dataclasses

        spec = read_specfile(open(args.spec).read())
        ctl = apply_specfile(ctl, spec)
        ctl = dataclasses.replace(ctl, ipm=apply_specfile(ctl.ipm, spec))
    return ctl


def _solve_one(path, ctl):
    from .core.residuals import kkt_residuals
    from .core.status import Status
    from .io import qplib
    from .qp.frontend import qp_solve

    qp = qplib.read_qp(path)
    t0 = time.perf_counter()
    x, y, z, info = qp_solve(qp, ctl)
    wall = time.perf_counter() - t0
    rp, rd, rc = kkt_residuals(qp, x, y, z)
    status = getattr(info, "status", 0)
    try:
        status = int(status)
    except TypeError:
        status = 0
    obj = float(0.5 * x @ qp.Hx(x) + qp.g @ x + qp.f)
    it = getattr(info, "iter", -1)
    return dict(
        name=qp.name or path, n=qp.n, m=qp.m,
        status=status, status_name=Status(status).name
        if status in set(int(s) for s in Status) else str(status),
        objective=obj,
        primal_infeasibility=float(rp),
        dual_infeasibility=float(rd),
        complementary_slackness=float(rc),
        iterations=int(it) if it is not None else -1,
        time=wall,
        inform=getattr(info, "inform", None),
        x=x, y=y, z=z,
    )


def cmd_solve(args) -> int:
    ctl = _build_control(args)
    r = _solve_one(args.problem, ctl)
    if args.json:
        out = {k: v for k, v in r.items() if k not in ("x", "y", "z", "inform")}
        print(json.dumps(out))
    else:
        print(f" problem        {r['name']}")
        print(f" n, m           {r['n']}, {r['m']}")
        print(f" solver         {args.solver}")
        print(f" status         {r['status']} ({r['status_name']})")
        print(f" objective      {r['objective']:.10e}")
        print(f" primal infeas  {r['primal_infeasibility']:.2e}")
        print(f" dual   infeas  {r['dual_infeasibility']:.2e}")
        print(f" compl. slack   {r['complementary_slackness']:.2e}")
        print(f" iterations     {r['iterations']}")
        print(f" time (s)       {r['time']:.3f}")
        inform = r.get("inform")
        if inform is not None:
            # GALAHAD-style footer: phase clocks + factorization counts
            # (reference cqp.f90:2926-2933 iteration footer and
            # PKG_time_type cqp.f90:429-473)
            t = inform.time
            print(f" factorizations {inform.nfacts}   backsolves {inform.nbacts}")
            print(f" phase times    preprocess {t.preprocess:.3f}  "
                  f"analyse+compile {t.analyse:.3f}  solve {t.solve:.3f}  "
                  f"total {t.total:.3f}")
            if inform.checkpoints_iter is not None:
                marks = [f"1e-{i+1}:{int(it_)}"
                         for i, it_ in enumerate(inform.checkpoints_iter[:8])
                         if int(it_) >= 0]
                if marks:
                    print(f" checkpoints    {' '.join(marks)}")
    if args.solution_file:
        import numpy as np
        with open(args.solution_file, "w") as fh:
            fh.write(f"{r['name']} status {r['status']} "
                     f"objective {r['objective']:.12e}\n")
            for tag, vec in (("x", r["x"]), ("y", r["y"]), ("z", r["z"])):
                fh.write(f"{tag} {len(np.asarray(vec))}\n")
                for v in np.asarray(vec):
                    fh.write(f"  {v:.12e}\n")
    return 0 if r["status"] == 0 else 1


def cmd_batch(args) -> int:
    """One result line per problem (galtests RES.d convention):
    name n m status objective primal dual compl iters time."""
    ctl = _build_control(args)
    problems = [ln.strip() for ln in open(args.list)
                if ln.strip() and not ln.startswith("#")]
    out = open(args.out, "a") if args.out else sys.stdout
    failures = 0
    for p in problems:
        try:
            r = _solve_one(p, ctl)
            line = (f"{r['name']:24s} {r['n']:8d} {r['m']:8d} "
                    f"{r['status']:4d} {r['objective']: .8e} "
                    f"{r['primal_infeasibility']:.1e} "
                    f"{r['dual_infeasibility']:.1e} "
                    f"{r['complementary_slackness']:.1e} "
                    f"{r['iterations']:6d} {r['time']:9.3f}")
            failures += r["status"] != 0
        except Exception as e:  # noqa: BLE001 — batch must survive bad files
            line = f"{p:24s} ERROR {type(e).__name__}: {e}"
            failures += 1
        print(line, file=out)
        out.flush()
    if args.out:
        out.close()
    return 1 if failures else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="galahad_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--solver", default="cqp",
                        choices=["cqp", "dqp", "ccqp", "qpa", "qpb",
                                 "qpc", "lpa", "lpb"])
    common.add_argument("--spec", default=None,
                        help="GALAHAD-style specfile of keyword overrides")
    common.add_argument("--scale", action="store_true")
    common.add_argument("--presolve", action="store_true")
    common.add_argument("--dtype", default="auto",
                        choices=["auto", "float32", "float64"],
                        help="auto = float64 where the backend supports "
                             "it (CPU), float32 on TPU")

    ps = sub.add_parser("solve", parents=[common])
    ps.add_argument("problem")
    ps.add_argument("--solution-file", default=None)
    ps.add_argument("--json", action="store_true")
    ps.set_defaults(fn=cmd_solve)

    pb = sub.add_parser("batch", parents=[common])
    pb.add_argument("list", help="text file with one QPLIB path per line")
    pb.add_argument("--out", default=None, help="append results here")
    pb.set_defaults(fn=cmd_batch)

    args = ap.parse_args(argv)
    # dtype resolution: the reference library is a double-precision
    # Fortran code; on hosts that support it the CLI matches that
    # default (TPU hardware is f32 + double-word refinement).
    import jax

    want64 = (args.dtype == "float64"
              or (args.dtype == "auto"
                  and jax.default_backend() != "tpu"))
    if want64:
        jax.config.update("jax_enable_x64", True)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
