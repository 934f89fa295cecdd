"""Pure deterministic core: tokenize → classify → strip → segment → assemble.

No Ray imports anywhere in this subpackage. Every function here must be
deterministic given its inputs (no wall clock, no randomness, no float
accumulation-order dependence) because the engine's per-url byte-identity
invariant (BASELINE.json ``input_hint``) is proven by running these same
functions under different parallelism levels.
"""
