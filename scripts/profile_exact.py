"""Measure the exact-semantics fast front-end on the real chip.

Builds the bench workload (bench.py's 4M corridor, 24 towers), runs the
product routing (extract_from_points -> exact fast path) once for
correctness, then times the settled graph with queued dispatches.

Usage: python scripts/profile_exact.py [n_mpts] [modular]
  modular: also time the old extract_step path for comparison (slow).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    n_mpts = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    do_modular = "modular" in sys.argv[1:]
    n = int(n_mpts * 1024 * 1024)

    sys.path.insert(0, "/root/repo")
    import bench

    from pointcloudhookup_tpu.config import ExtractParams
    from pointcloudhookup_tpu.models.pipeline import (
        _exact_fast_plan,
        _extract_stats_exact_fast,
        extract_from_points,
    )

    xyz, mask, centers = bench.build_workload(n)
    params = ExtractParams()
    print(f"workload: {n} pts, {len(centers)} towers", flush=True)

    # ---- correctness through the product routing (includes retries)
    t0 = time.perf_counter()
    pts64 = xyz[mask].astype(np.float64)
    plan = _exact_fast_plan(pts64, params, n)
    print("cell plan:", plan, flush=True)
    stats = _extract_stats_exact_fast(xyz, mask, params, plan)
    print(
        f"routing done in {time.perf_counter() - t0:.1f}s (incl. compiles):"
        f" accepted={int(stats['accepted'].sum())}/{len(centers)}"
        f" cells_overflow={float(stats['cells_overflow'])}",
        flush=True,
    )
    acc = np.nonzero(stats["accepted"])[0]
    got_centers = stats["center"][acc]
    found = 0
    for c in centers:
        d = np.linalg.norm(got_centers[:, :2] - (np.asarray(c[:2]) - pts64.mean(0)[:2]), axis=1)
        found += int((d < 6.0).any())
    print(f"planted towers recovered: {found}/{len(centers)}", flush=True)

    # ---- timing: the settled graph, ITERS queued dispatches per fence
    from pointcloudhookup_tpu.ops.frontend_exact import exact_extract_graph

    ccap = max(n // 4 // 32768 * 32768, 32768)
    xyz_j = jnp.asarray(xyz)
    mask_j = jnp.asarray(mask)

    def run(floor, core_cap):
        return exact_extract_graph(
            xyz_j, mask_j, params, cell_bits=plan, compact_cap=ccap,
            max_cells=params.cluster.max_cells, min_cell_points=floor,
            core_cap=core_cap,
        )

    # find the settled floor + core cap the wrapper used
    floor = params.cluster.min_cell_points
    core_cap = 2048
    while True:
        out = run(floor, core_cap)
        over = float(np.asarray(out["cells_overflow"]))
        core_over = float(np.asarray(out["core_overflow"]))
        cnt = int(np.asarray(out["compact_count"]))
        print(f"floor={floor} core_cap={core_cap}: cells_overflow={over}"
              f" core_overflow={core_over} compact={cnt}/{ccap}",
              flush=True)
        if cnt > ccap:
            raise SystemExit("survivor capacity overflow at N/4 — retune")
        if core_over > 0.0 and core_cap < 32768:
            core_cap *= 4
            continue
        if over > 0.0 and floor < 16:
            floor = min(floor * 2 if floor > 1 else 2, 16)
            continue
        break

    ITERS = 32
    def fence(o):
        return np.asarray(o["accepted"][0:1])

    for _ in range(2):
        fence(run(floor, core_cap))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = run(floor, core_cap)
        fence(out)
        dt = min(dt, (time.perf_counter() - t0) / ITERS)
    print(
        f"exact fast path: {n / dt / 1e6:.1f} Mpts/s"
        f" ({dt * 1e3:.2f} ms/iter, floor={floor},"
        f" towers={int(np.asarray(out['accepted']).sum())})",
        flush=True,
    )

    if "cuts" in sys.argv[1:]:
        # cumulative stage profile: prefix graphs, deltas = stage costs
        names = {
            1: "percentile+cut", 2: "+compact", 3: "+cell sort",
            4: "+scans/pack", 5: "+cluster kernel", 6: "+label fill",
            0: "full (+obb/filters)",
        }
        prev = 0.0
        names[41] = '+pop pass'; names[42] = '+core flood'
        for cut in (1, 2, 3, 4, 41, 42, 5, 6, 0):
            def run_cut(floor=floor, cut=cut, core_cap=core_cap):
                return exact_extract_graph(
                    xyz_j, mask_j, params, cell_bits=plan, compact_cap=ccap,
                    max_cells=params.cluster.max_cells,
                    min_cell_points=floor, core_cap=core_cap, _cut=cut,
                )
            def fence_cut(o):
                v = next(iter(o.values()))
                return np.asarray(v.reshape(-1)[0:1])
            for _ in range(2):
                fence_cut(run_cut())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    o = run_cut()
                fence_cut(o)
                best = min(best, (time.perf_counter() - t0) / ITERS)
            print(f"cut {cut} ({names[cut]}): {best * 1e3:.2f} ms"
                  f" (delta {max(best - prev, 0) * 1e3:+.2f})", flush=True)
            if cut != 0:
                prev = best

    if do_modular:
        t0 = time.perf_counter()
        towers, st, _ = extract_from_points(pts64, params)
        print(f"(routing check: extract_from_points -> {len(towers)} towers,"
              f" {time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
