"""shard_map compatibility: jax>=0.8 moved it to ``jax.shard_map`` and
renamed ``check_rep`` to ``check_vma``; older jax has it under
``jax.experimental.shard_map``. Expose one signature for both."""

import jax

if hasattr(jax, 'shard_map'):
    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep)
else:
    from jax.experimental.shard_map import shard_map  # noqa: F401
