from .profiling import profile_trace, StepTimer

__all__ = ["profile_trace", "StepTimer"]
