from .rates import derive_rates, per_100k, percentage_rate

__all__ = ["derive_rates", "per_100k", "percentage_rate"]
