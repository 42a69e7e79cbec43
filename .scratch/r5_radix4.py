"""Exhaustive-ish verification: radix-4 digit-fixing concentrator on 128
lanes is conflict-free for compaction routes (dest = rank of valid lanes,
invalid lanes stay put unless displaced)."""
import numpy as np

def compact_radix4(valid, vals):
    n = len(vals)
    lane = np.arange(n)
    rank = np.cumsum(valid) - valid
    dest = np.where(valid > 0, rank, lane)
    vals = vals.copy(); valid = valid.copy(); dest = dest.copy()
    stages = [(1, 4), (4, 4), (16, 4), (64, 2)]
    for b, radix in stages:
        cur_d = (lane // b) % radix
        dst_d = (dest // b) % radix
        move = (valid > 0) & (cur_d != dst_d)
        tgt = lane + (dst_d - cur_d) * b
        # conflict check: no two movers to same target; no mover lands on
        # a stationary VALID element that isn't itself moving
        tgts = tgt[move]
        assert len(np.unique(tgts)) == len(tgts), f"collision at b={b}"
        stay = (valid > 0) & ~move
        assert not np.any(np.isin(tgts, lane[stay])), f"displace at b={b}"
        nv = np.zeros_like(vals); nvl = np.zeros_like(valid); nd = np.zeros_like(dest)
        # stationary first
        nv[stay] = vals[stay]; nvl[stay] = 1; nd[stay] = dest[stay]
        # movers
        nv[tgt[move]] = vals[move]; nvl[tgt[move]] = 1; nd[tgt[move]] = dest[move]
        vals, valid, dest = nv, nvl, nd
    return valid, vals

rng = np.random.default_rng(0)
for trial in range(20000):
    n = 128
    p = rng.uniform(0.01, 0.9)
    valid = (rng.random(n) < p).astype(np.int64)
    vals = rng.integers(0, 1000, n)
    v_out, x_out = compact_radix4(valid, vals)
    k = valid.sum()
    assert (v_out[:k] == 1).all() and (v_out[k:] == 0).all()
    assert (x_out[:k] == vals[valid > 0]).all()
print("radix-4 concentrator verified: 20000 random masks, no conflicts")
