from .tb_pipeline import run_tb_pipeline, TBMarts

__all__ = ["run_tb_pipeline", "TBMarts"]
