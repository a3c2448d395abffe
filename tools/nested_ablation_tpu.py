"""Microbenchmark the nested-spawn machinery piece by piece on TPU.

Each piece runs as its own jitted lax.scan chain over synthetic-but-realistic
inputs (N=131072 pool, M=4096 child buffer, ~8k emitting parents), so the
number is device time per iteration with dispatch amortized.
Run: python tools/nested_ablation_tpu.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N = 16 * 8192
M = 4096
E = 2

rng = np.random.RandomState(0)
alive_np = rng.rand(N) < 0.67
age_np = (rng.rand(N) * 2.0).astype(np.float32)
life_np = np.full(N, 2.0, np.float32)
last_np = (age_np - 0.02).astype(np.float32)
parent_np = alive_np & (rng.rand(N) < 0.09)  # ~8k emitting parents


def chain(f, x0, n=200):
    def body(c, _):
        return f(c), None

    g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
    x0 = jax.tree_util.tree_map(jnp.asarray, x0)
    r = g(x0)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(x0)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    from bevy_firework_tpu.cadence import compute_emission_count

    alive = jnp.asarray(alive_np)
    age = jnp.asarray(age_np)
    life = jnp.asarray(life_np)
    parent_mask = jnp.asarray(parent_np)

    # 1. per-parent cadence + masking
    def f_cadence(last):
        counts, next_last = compute_emission_count(age, last, life, 0.0, 1.0, 10.0)
        counts = jnp.where(parent_mask, counts, 0)
        return jnp.where(parent_mask, next_last, last) + 0.0 * counts.sum()

    print(f"cadence [N]:            {chain(f_cadence, last_np):.3f} ms")

    # 2. cumsum over [N]
    counts0 = jnp.where(parent_mask, 3, 0).astype(jnp.int32)

    def f_cumsum(c):
        cum = jnp.cumsum(c)
        return c + cum[-1] % 2

    print(f"cumsum [N]:             {chain(f_cumsum, counts0):.3f} ms")

    # 3. rank-owner scatter + cummax over [M]
    cum0 = jnp.cumsum(counts0)
    starts0 = cum0 - counts0
    slot_ids = jnp.arange(N, dtype=jnp.int32)

    def f_rank(starts):
        pos = jnp.where((counts0 > 0) & (starts < M), starts, M)
        owner = jnp.full((M,), -1, jnp.int32).at[pos].max(slot_ids, mode="drop")
        pfr = jax.lax.cummax(owner)
        return starts + pfr[-1] % 2

    print(f"rank scatter+cummax[M]: {chain(f_rank, starts0):.3f} ms")

    # 4. dead-rank cumsum + slot_for_rank scatter ([N] updates -> [M] target)
    dead = ~alive

    def f_slot(di):
        rank = jnp.cumsum(di) - di
        sfr = (
            jnp.full((M,), N, jnp.int32)
            .at[jnp.where(dead & (rank < M), rank, M)]
            .set(slot_ids, mode="drop")
        )
        return di + sfr[-1] % 2

    print(f"dead cumsum+slot [N->M]:{chain(f_slot, dead.astype(jnp.int32)):.3f} ms")

    # 5. stacked parent gather [10, M]
    pstack = jnp.asarray(rng.rand(10, N).astype(np.float32))
    child_parent0 = jnp.asarray(rng.randint(0, N, M).astype(np.int32))

    def f_gather(cp):
        pg = pstack[:, cp]
        return cp + (pg.sum() > 0).astype(jnp.int32)

    print(f"parent gather [10,M]:   {chain(f_gather, child_parent0):.3f} ms")

    # 6. pool write-back: stacked [16, N] scatter at M columns + small companions
    pool0 = jnp.asarray(rng.rand(16, N).astype(np.float32))
    child_vals = jnp.asarray(rng.rand(16, M).astype(np.float32))
    sfr0 = jnp.asarray(np.sort(rng.choice(N, M, replace=False)).astype(np.int32))
    ptype0 = jnp.zeros(N, jnp.int32)
    lem0 = jnp.zeros((E, N), jnp.float32)

    def f_write(pool):
        p2 = pool.at[:, sfr0].set(child_vals, mode="drop")
        pt = ptype0.at[sfr0].set(1, mode="drop")
        al = alive.at[sfr0].set(True, mode="drop")
        lem = lem0.at[:, sfr0].set(-3.4e38, mode="drop")
        return p2 + (pt.sum() + al.sum() + lem.sum()) * 0.0

    print(f"pool scatter write:     {chain(f_write, pool0):.3f} ms")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def sorted_variants():
    """Sorted-index scatter reformulations (indices_are_sorted fast path)."""
    from bevy_firework_tpu.cadence import compute_emission_count  # noqa

    alive = jnp.asarray(alive_np)
    parent_mask = jnp.asarray(parent_np)
    counts0 = jnp.where(parent_mask, 3, 0).astype(jnp.int32)
    slot_ids = jnp.arange(N, dtype=jnp.int32)
    cum0 = jnp.cumsum(counts0)
    starts0 = cum0 - counts0
    dead = ~alive

    def f_rank_sorted(starts):
        # min(starts, M) is non-decreasing; duplicates resolved by max:
        # the owning (counts>0) parent has the largest slot id at its start.
        pos = jnp.minimum(starts, M)
        owner = jnp.full((M,), -1, jnp.int32).at[pos].max(
            slot_ids, mode="drop", indices_are_sorted=True
        )
        pfr = jax.lax.cummax(owner)
        return starts + pfr[-1] % 2

    print(f"rank sorted-scatter:    {chain(f_rank_sorted, starts0):.3f} ms")

    def f_slot_sorted(di):
        rank = jnp.cumsum(di) - di
        pos = jnp.minimum(rank, M)
        sfr = jnp.full((M,), -1, jnp.int32).at[pos].max(
            slot_ids, mode="drop", indices_are_sorted=True
        )
        total_dead = rank[-1] + di[-1]
        sfr = jnp.where(jnp.arange(M) < total_dead, sfr, N)
        return di + sfr[-1] % 2

    print(f"slot sorted-scatter:    {chain(f_slot_sorted, dead.astype(jnp.int32)):.3f} ms")

    # reference: same ops WITHOUT the sorted hint, max-combiner
    def f_rank_max_unsorted(starts):
        pos = jnp.where((counts0 > 0) & (starts < M), starts, M)
        owner = jnp.full((M,), -1, jnp.int32).at[pos].max(slot_ids, mode="drop")
        pfr = jax.lax.cummax(owner)
        return starts + pfr[-1] % 2

    print(f"rank max (unsorted):    {chain(f_rank_max_unsorted, starts0):.3f} ms")


if __name__ == "__main__" and "--sorted" in sys.argv:
    sorted_variants()


def inverse_variants():
    """Scatter-free monotone inverse: p(r) = #(cum[i] <= r) via block
    two-level counting (coarse over block maxima + fine in one gathered
    block). Replaces BOTH 1ms scatters."""
    alive = jnp.asarray(alive_np)
    parent_mask = jnp.asarray(parent_np)
    counts0 = jnp.where(parent_mask, 3, 0).astype(jnp.int32)

    def monotone_inverse(cum, m):
        n = cum.shape[0]
        B = 128
        nb = n // B
        blocks = cum.reshape(nb, B)
        block_max = blocks[:, -1]
        r = jnp.arange(m, dtype=cum.dtype)
        nfull = jnp.sum((block_max[None, :] <= r[:, None]).astype(jnp.int32), axis=1)
        blk = jnp.take(blocks, jnp.minimum(nfull, nb - 1), axis=0)
        fine = jnp.sum((blk <= r[:, None]).astype(jnp.int32), axis=1)
        return nfull * B + jnp.where(nfull < nb, fine, 0)

    def f_inv_parent(c):
        cum = jnp.cumsum(c)
        p = monotone_inverse(cum, M)
        return c + p[-1] % 2

    print(f"cumsum+inverse [N->M]:  {chain(f_inv_parent, counts0):.3f} ms")

    # correctness vs the scatter+cummax formulation
    cum = jnp.cumsum(counts0)
    starts = cum - counts0
    slot_ids = jnp.arange(N, dtype=jnp.int32)
    pos = jnp.where((counts0 > 0) & (starts < M), starts, M)
    owner = jnp.full((M,), -1, jnp.int32).at[pos].max(slot_ids, mode="drop")
    ref = jax.lax.cummax(owner)
    got = monotone_inverse(cum, M)
    total = int(cum[-1])
    k = min(M, total)
    ok = bool(jnp.all(got[:k] == ref[:k]))
    print(f"inverse == scatter+cummax on {k} valid ranks: {ok}")
    assert ok


if __name__ == "__main__" and "--inverse" in sys.argv:
    inverse_variants()
