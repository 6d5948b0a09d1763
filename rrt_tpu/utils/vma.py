"""Varying-manual-axes (VMA) helpers for code shared between the
single-device drivers and the shard_map entry points.

shard_map's static verifier (check_vma=True, the default) types every
value by the mesh axes it may vary over. A `lax.while_loop`/`lax.scan`
carry must have the SAME vma type at init and at the body output — but
the drivers seed their carries with freshly created constants
(`jnp.zeros`, dummy keys), which are device-INVARIANT, while the body
mixes in dp/sp-varying inputs (pixel ids, per-rank sample offsets), so
the output carry is varying and the verifier rejects the loop. Rounds
2-4 disabled the check (`check_vma=False`) with a canary test; round 5
fixes it properly: `vary_for_mesh` casts a carry init to varying over
every axis of the enclosing shard_map (a pure weakening — "this value
may differ across devices" — so it is always sound), and is a no-op
outside any shard_map, keeping the shared drivers single-device clean.

Axis discovery uses jax's axis env (private module path, with the
public-but-discouraged alias as fallback); test_sharding.py pins the
behavior so a jax upgrade that moves the API fails loudly.
"""

import jax


def manual_axis_names():
    """Names of every mesh axis of the enclosing shard_map(s), () when
    not under one."""
    try:
        from jax._src.core import get_axis_env
        return tuple(get_axis_env().axis_sizes)
    except Exception:  # noqa: BLE001 — jax moved the private API
        try:
            import jax.core as jcore
            return tuple(jcore.unsafe_get_axis_names_DO_NOT_USE())
        except Exception:  # noqa: BLE001
            return ()


def vary_for_mesh(tree):
    """Mark every leaf of `tree` as device-varying over all enclosing
    shard_map axes (no-op outside a shard_map, and per-leaf only over
    the axes the leaf is not already varying on — pcast rejects
    varying->varying). Apply to loop-carry INITIAL values in code
    shared with single-device paths."""
    axes = manual_axis_names()
    if not axes:
        return tree

    def cast(x):
        try:
            have = set(jax.typeof(x).vma)
        except Exception:  # noqa: BLE001 — aval without vma typing
            have = set()
        need = tuple(a for a in axes if a not in have)
        return jax.lax.pcast(x, need, to="varying") if need else x

    return jax.tree.map(cast, tree)
