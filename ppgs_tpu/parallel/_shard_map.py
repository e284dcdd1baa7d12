"""shard_map compatibility: jax>=0.8 moved it to ``jax.shard_map`` and
renamed ``check_rep`` to ``check_vma``; older jax has it under
``jax.experimental.shard_map``. Expose one signature for both.

``manual_axes``: mesh axis names the body handles manually (collectives,
axis_index). Axes NOT listed stay in GSPMD "auto" mode inside the body —
sharding propagates from the arguments' placements and XLA inserts the
collectives, which is how tensor parallelism composes with an explicitly
scheduled pipeline (pipeline.py). Default: all mesh axes manual (the
plain shard_map behavior).
"""

import jax

if hasattr(jax, 'shard_map'):
    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kwargs = {}
        if manual_axes is not None:
            kwargs['axis_names'] = frozenset(manual_axes)
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep, **kwargs)
else:
    from jax.experimental.shard_map import shard_map as _shard_map_impl

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kwargs = {}
        if manual_axes is not None:
            kwargs['auto'] = (frozenset(mesh.axis_names)
                              - frozenset(manual_axes))
        return _shard_map_impl(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_rep, **kwargs)
