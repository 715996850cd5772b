"""Engineering attic: retired kernel generations kept as measured records.

Modules here are NOT part of the supported backend surface (step.make_step
and the CLI no longer expose them); they remain importable and tested so
the design lessons in docs/DESIGN.md stay reproducible.
"""
