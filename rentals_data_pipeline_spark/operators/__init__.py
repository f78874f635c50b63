"""Operator library: pure DataFrame -> DataFrame functions.

Compose with ``df.transform(op(...))`` — the engine's composition idiom
(reference: jobs/transform.py:174-181 uses the same shape).
"""
