from .monodomain import step, simulate, run_protocol, StepAux

__all__ = ["step", "simulate", "run_protocol", "StepAux"]
