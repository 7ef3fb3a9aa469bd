"""Engine-wide exception types. Kept dependency-free so operator and
registry modules can both import them without touching package
``__init__`` side effects (the registry package imports the operator
package, so an operator importing ``registry._base`` directly would be
circular)."""

from __future__ import annotations


class ScaleRefusal(ValueError):
    """Raised by a probe-and-refuse guard: the key measured its own
    pre-flight cost (pairs_bound / wedges / row count), found it over
    the declared budget, and refused INSTEAD of silently paying a
    scale-killing bill (VERDICT r8 #5). Subclasses ValueError so
    existing callers and tests keep working; carrying its own type
    lets harnesses (bench.py's ``refusals`` bucket) record a designed
    refusal separately from a genuine failure — a reader of the
    artifact should never mistake the guard doing its job for a
    regression. Every refusal message names the measured bill, the
    budget, the capped/flat alternative tier, and the deliberate
    override."""
