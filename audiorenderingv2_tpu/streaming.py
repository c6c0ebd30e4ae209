"""Streaming / auralization runtime.

Covers the reference's interactive layers without a GL window or sound card:

* :class:`RingBuffer` — accumulate/drain ring buffer with the exact semantics
  of the reference's CircularBuffer.h: ``add`` sums in place WITHOUT advancing
  (so overlapping convolution tails from consecutive live blocks stack), and
  ``get_and_reset`` reads n values, zeroes them, and advances. This is the
  pure-numpy implementation; ``native.NativeRingBuffer`` is the semantically
  identical C++ version for native streaming pipelines.

* :class:`ListenerTrajectory` + :class:`Auralizer` — scripted listener
  movement replacing the GLFW walkthrough: the re-render policy (move beyond
  the distance threshold, turn beyond the angle threshold, or a 1 s settle
  timer after motion) reproduces main.cpp:470-498.

* :class:`LiveConvolver` — the full-duplex mic path of audioHandlerWithMic
  (main.cpp:99-135): per-block convolve against the current IR, drain the
  ring buffer, NaN-guard, volume gain.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class RingBuffer:
    """Accumulating ring buffer (CircularBuffer.h:13-36 semantics)."""

    def __init__(self, capacity: int, dtype=np.float64):
        self.data = np.zeros(capacity, dtype)
        self.capacity = int(capacity)
        self.head = 0

    def add(self, values: np.ndarray) -> None:
        """Sum ``values`` into the buffer starting at the head, wrapping;
        does NOT advance the head."""
        values = np.asarray(values, self.data.dtype)
        n = values.shape[0]
        if n > self.capacity:
            raise ValueError("more values than capacity")
        first = min(n, self.capacity - self.head)
        self.data[self.head : self.head + first] += values[:first]
        if n > first:
            self.data[: n - first] += values[first:]

    def get_and_reset(self, n: int) -> np.ndarray:
        """Read n values from the head, zero them, advance the head."""
        if n > self.capacity:
            raise ValueError("more values than capacity")
        first = min(n, self.capacity - self.head)
        out = np.empty(n, self.data.dtype)
        out[:first] = self.data[self.head : self.head + first]
        self.data[self.head : self.head + first] = 0
        if n > first:
            rest = n - first
            out[first:] = self.data[:rest]
            self.data[:rest] = 0
        self.head = (self.head + n) % self.capacity
        return out


@dataclass
class TrajectoryPoint:
    """Listener pose at a time instant."""

    time: float
    position: np.ndarray
    yaw_deg: float


class ListenerTrajectory:
    """A scripted listener path: piecewise-linear position and yaw."""

    def __init__(self, points: list[TrajectoryPoint]):
        if not points:
            raise ValueError("empty trajectory")
        self.points = sorted(points, key=lambda p: p.time)

    @classmethod
    def from_arrays(cls, times, positions, yaws_deg):
        return cls([
            TrajectoryPoint(float(t), np.asarray(p, np.float32), float(y))
            for t, p, y in zip(times, positions, yaws_deg)
        ])

    def at(self, t: float) -> tuple[np.ndarray, float]:
        pts = self.points
        if t <= pts[0].time:
            return pts[0].position, pts[0].yaw_deg
        if t >= pts[-1].time:
            return pts[-1].position, pts[-1].yaw_deg
        for a, b in zip(pts[:-1], pts[1:]):
            if a.time <= t <= b.time:
                w = (t - a.time) / max(b.time - a.time, 1e-9)
                pos = (1 - w) * a.position + w * b.position
                # shortest-arc yaw interpolation
                dy = ((b.yaw_deg - a.yaw_deg + 180.0) % 360.0) - 180.0
                return pos.astype(np.float32), a.yaw_deg + w * dy
        return pts[-1].position, pts[-1].yaw_deg

    @property
    def duration(self) -> float:
        return self.points[-1].time


class ReRenderPolicy:
    """The reference's movement-triggered re-render policy (main.cpp:470-498):
    re-render when the listener moved more than ``distance_threshold`` or
    turned more than ``angle_threshold`` since the last render, or
    ``settle_seconds`` after motion STOPS while the pose still differs from
    the last render (the 1 s settle re-render)."""

    def __init__(self, distance_threshold: float = 2.0,
                 angle_threshold: float = 5.0, settle_seconds: float = 1.0):
        self.distance_threshold = float(distance_threshold)
        self.angle_threshold = float(angle_threshold)
        self.settle_seconds = float(settle_seconds)
        self._last_pos: np.ndarray | None = None  # pose at last render
        self._last_yaw = 0.0
        self._query_pos: np.ndarray | None = None  # pose at previous query
        self._query_yaw = 0.0
        self._moved_at: float | None = None  # time of last observed motion

    def should_render(self, t: float, pos: np.ndarray, yaw_deg: float) -> bool:
        pos = np.asarray(pos, np.float32)
        if self._last_pos is None:
            self._note(t, pos, yaw_deg)
            return True
        # Track when motion was last OBSERVED (query-to-query), so the
        # settle timer measures time since motion stopped, not since it
        # started — matching the reference's lastMovement timestamping.
        if self._query_pos is not None:
            step = float(np.linalg.norm(pos - self._query_pos))
            turn = abs(((yaw_deg - self._query_yaw + 180.0) % 360.0) - 180.0)
            if step > 1e-6 or turn > 1e-6:
                self._moved_at = t
        self._query_pos = pos.copy()
        self._query_yaw = float(yaw_deg)

        moved = float(np.linalg.norm(pos - self._last_pos))
        turned = abs(((yaw_deg - self._last_yaw + 180.0) % 360.0) - 180.0)
        if moved > self.distance_threshold or turned > self.angle_threshold:
            self._note(t, pos, yaw_deg)
            return True
        pose_stale = moved > 1e-6 or turned > 1e-6
        if (pose_stale and self._moved_at is not None
                and t - self._moved_at >= self.settle_seconds):
            self._note(t, pos, yaw_deg)
            return True
        return False

    def _note(self, t, pos, yaw_deg):
        self._last_pos = np.asarray(pos, np.float32).copy()
        self._last_yaw = float(yaw_deg)
        self._moved_at = None


class Auralizer:
    """Offline real-time-equivalent auralization along a trajectory.

    Walks the trajectory in ``chunk_seconds`` steps; whenever the re-render
    policy fires, renders a fresh IR at the current pose and re-convolves.
    Each output chunk comes from the most recent convolution, reproducing
    what the reference's audio callback plays while the render worker swaps
    buffers (main.cpp:69-95, 470-498).
    """

    def __init__(self, renderer, trajectory: ListenerTrajectory,
                 policy: ReRenderPolicy | None = None,
                 chunk_seconds: float = 0.25, volume: float = 1.0):
        self.renderer = renderer
        self.trajectory = trajectory
        self.policy = policy or ReRenderPolicy()
        self.chunk_seconds = float(chunk_seconds)
        self.volume = float(volume)
        self.renders = 0

    def run(self, samples: np.ndarray) -> np.ndarray:
        """Auralize ``samples`` (mono float [L]) along the trajectory.

        Returns stereo float32 [2, L].
        """
        sr = self.renderer.params.sample_rate
        length = samples.shape[0]
        out = np.zeros((2, length), np.float32)
        chunk = max(1, int(round(self.chunk_seconds * sr)))
        current: np.ndarray | None = None
        for start in range(0, length, chunk):
            t = start / sr
            pos, yaw = self.trajectory.at(t)
            if self.policy.should_render(t, pos, yaw) or current is None:
                current = self.renderer.full_render_cycle(pos, yaw, samples)
                self.renders += 1
            stop = min(start + chunk, length)
            out[:, start:stop] = current[:, start:stop]
        return out * self.volume


class LiveConvolver:
    """Block-wise live convolution with ring-buffer overlap accumulation
    (audioHandlerWithMic, main.cpp:99-135)."""

    def __init__(self, renderer, volume: float = 1.0):
        self.renderer = renderer
        self.volume = float(volume)
        n = renderer.params.ir_length
        self.ring = RingBuffer(2 * n + 1, dtype=np.float64)

    def process_block(self, in_block: np.ndarray) -> np.ndarray:
        """One callback block [n_frames] -> interleaved stereo [2*n_frames].

        NaN outputs are zeroed like the reference's guard (main.cpp:118-124).
        """
        n_frames = in_block.shape[0]
        self.renderer.convolve_live_input(in_block, self.ring)
        out = self.ring.get_and_reset(2 * n_frames) * self.volume
        return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)
