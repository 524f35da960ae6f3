from .optim import one_cycle_schedules, build_optimizer

__all__ = ["one_cycle_schedules", "build_optimizer"]
