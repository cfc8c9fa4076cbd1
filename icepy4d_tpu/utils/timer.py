"""Named-checkpoint timer with exponential smoothing (ref utils/timer.py:8-60)."""

from __future__ import annotations

import functools
import time

from icepy4d_tpu.utils.logger import get_logger


class AverageTimer:
    def __init__(self, smoothing: float = 0.3, newline: bool = False):
        self.smoothing = smoothing
        self.newline = newline
        self.times: dict[str, float] = {}
        self.will_print: dict[str, bool] = {}
        self.reset()

    def reset(self) -> None:
        self.start = time.perf_counter()
        self.last_time = self.start

    def update(self, name: str = "default") -> None:
        now = time.perf_counter()
        dt = now - self.last_time
        if name in self.times:
            dt = self.smoothing * dt + (1.0 - self.smoothing) * self.times[name]
        self.times[name] = dt
        self.will_print[name] = True
        self.last_time = now

    def print(self, text: str = "Timer") -> None:
        total = 0.0
        parts = []
        for name, t in self.times.items():
            if self.will_print.get(name):
                parts.append(f"{name}={t:.3f}")
                total += t
        get_logger().info(f"[{text}] " + ", ".join(parts) + f" total={total:.3f} s")
        self.reset()


def timeit(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        get_logger().info(
            f"Function {func.__name__} took {time.perf_counter() - t0:.4f} s"
        )
        return result

    return wrapper
