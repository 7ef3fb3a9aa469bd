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
    override.

    Machine-readable fields (VERDICT r9 #8): a 100 TB pipeline that
    catches this should be able to ROUTE to the bounded tier
    programmatically instead of parsing prose, so the guard also
    passes its numbers as structured keywords. ``payload()`` returns
    the non-None fields as a plain dict for artifact recording
    (bench.py's refusals bucket). The human message is unchanged —
    the fields are additive.

    * ``key``: the guard site (artifact or registry-key name);
    * ``measured``: the measured pre-flight bound (pairs/wedges);
    * ``budget``: the budget it exceeded;
    * ``alternative``: the registry key of the bounded/flat tier a
      caller should route to;
    * ``override_env``: the env var a deliberate run sets to pay the
      bill anyway.
    """

    def __init__(
        self,
        message: str,
        *,
        key: str | None = None,
        measured: int | float | None = None,
        budget: int | None = None,
        alternative: str | None = None,
        override_env: str | None = None,
    ) -> None:
        super().__init__(message)
        self.key = key
        self.measured = measured
        self.budget = budget
        self.alternative = alternative
        self.override_env = override_env

    def payload(self) -> dict:
        """The structured fields (non-None only), artifact-ready."""
        fields = {
            "key": self.key,
            "measured": self.measured,
            "budget": self.budget,
            "alternative": self.alternative,
            "override_env": self.override_env,
        }
        return {k: v for k, v in fields.items() if v is not None}
