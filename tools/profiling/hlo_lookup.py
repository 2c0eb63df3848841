"""Map hot trace op names (fusion.NNN / reshape.N / copy.N) to their
optimized-HLO definitions for the joint inference step.

Compiles the SAME jitted step as trace_joint.py (cache-hit: fast) and
prints, for each requested instruction name, its root expression and a
few operand lines — enough to attribute a trace row to model source.

Usage:
    nohup python -u tools/profiling/hlo_lookup.py fusion.309 fusion.37 \
        > /tmp/hlo_lookup.log 2>&1 &
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

IMG = 800
COMP = tuple(int(v) for v in
             os.environ.get("SM3DET_BENCH_COMP", "8,4,4").split(","))


def main(names):
    from trace_joint import build, log
    model, variables = build()
    rng = np.random.RandomState(1)
    n_sar, n_rgb, n_ifr = COMP
    sar = jnp.asarray(rng.rand(n_sar, IMG, IMG, 3).astype(np.float32))
    rgb = jnp.asarray(rng.rand(n_rgb, IMG, IMG, 3).astype(np.float32))
    ifr = jnp.asarray(rng.rand(n_ifr, IMG, IMG, 3).astype(np.float32))

    @jax.jit
    def step(v, s, r, f):
        outs = model.apply(v, s, r, f, (IMG, IMG),
                           method="simple_test_joint")
        c = jnp.zeros(())
        for d, l, valid in outs:
            c = c + jnp.sum(d) + jnp.sum(valid)
        return c

    log("lower+compile (cache-hit expected)...")
    compiled = step.lower(variables, sar, rgb, ifr).compile()
    txt = compiled.as_text()
    log(f"HLO text: {len(txt) / 1e6:.1f} MB")
    lines = txt.splitlines()

    # index: computation name -> (start, end) and instruction defs
    for want in names:
        pat = re.compile(rf"%?{re.escape(want)}(\.clone)?\s*=")
        hits = [i for i, l in enumerate(lines) if pat.search(l)]
        print(f"\n==== {want}: {len(hits)} definition(s)")
        for i in hits[:3]:
            print(lines[i][:400])
            # if it's a fusion, find its computation body by calls= name
            m = re.search(r"calls=%?([\w.\-]+)", lines[i])
            if m:
                comp = m.group(1)
                cpat = re.compile(rf"^%?{re.escape(comp)}\b")
                for j, l in enumerate(lines):
                    if cpat.match(l.strip()):
                        body = lines[j:j + 40]
                        print("  --- fusion body (first 40 lines):")
                        for b in body:
                            print("   " + b[:240])
                        break


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main(sys.argv[1:] or ["fusion.309", "fusion.37", "fusion.209",
                          "fusion.191", "fusion.112", "fusion.1501",
                          "fusion.254", "fusion.12", "fusion.3",
                          "while.97", "closed_call.31"])
