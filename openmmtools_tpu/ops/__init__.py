"""Compute ops: bonded/nonbonded energy functions, neighbor lists, constraints.

This package is the TPU-native replacement for the force/constraint kernels
the reference delegates to OpenMM's C++/CUDA platforms (SURVEY.md §2.2).
Everything here is a pure function of arrays, differentiable with ``jax.grad``
and composable under ``jit``/``vmap``/``shard_map``.
"""
