"""Keyframe database + place recognition as one MXU Hamming matmul.

Classic CPU SLAM uses a BoW vocabulary tree (DBoW2) because scoring a query
against thousands of keyframes is too slow brute-force. On TPU the economics
invert: the full query-vs-database Hamming distance matrix for 400 query
descriptors x (M keyframes x 400 descriptors) is a single ±1 bf16 matmul on
the MXU (ops/hamming.py) — exact retrieval, no vocabulary to train, no
quantization loss. The database is a padded device-resident tensor
``(M_cap, K_cap, 64) uint8``; scoring is a fixed-shape jitted program.

Score: fraction of valid query descriptors whose best match in a database
keyframe is below ``vote_threshold`` Hamming distance (descriptor voting).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming


class QueryResult(NamedTuple):
    scores: jnp.ndarray  # (M_cap,) per-database-frame score in [0, 1]
    best_index: jnp.ndarray  # () int32 argmax slot
    best_score: jnp.ndarray  # () float


@functools.partial(jax.jit, static_argnames=("use_mxu",))
def score_against_database(
    desc_q: jnp.ndarray,  # (Kq, 64) uint8 packed query descriptors
    mask_q: jnp.ndarray,  # (Kq,) bool
    db_desc: jnp.ndarray,  # (M, K, 64) uint8
    db_mask: jnp.ndarray,  # (M, K) bool
    allowed: jnp.ndarray,  # (M,) bool — candidate frames (occupied & not recent)
    vote_threshold: int = 60,
    use_mxu: bool = True,
) -> QueryResult:
    M, K, B = db_desc.shape
    d = hamming.hamming_matrix(desc_q, db_desc.reshape(M * K, B),
                               use_mxu=use_mxu)  # (Kq, M*K)
    d = d.reshape(d.shape[0], M, K)
    big = jnp.asarray(512.0, d.dtype)
    d = jnp.where(db_mask[None, :, :], d, big)
    best = jnp.min(d, axis=2)  # (Kq, M) best db descriptor per query desc
    votes = jnp.sum((best < vote_threshold) & mask_q[:, None], axis=0)  # (M,)
    nq = jnp.maximum(jnp.sum(mask_q), 1)
    scores = votes.astype(jnp.float32) / nq.astype(jnp.float32)
    scores = jnp.where(allowed, scores, -1.0)
    best_idx = jnp.argmax(scores)
    return QueryResult(scores=scores, best_index=best_idx,
                       best_score=scores[best_idx])


class KeyframeDatabase:
    """Fixed-capacity device-resident descriptor database.

    Host keeps id<->slot maps and per-keyframe geometry (bearings, landmark
    positions) for the geometric-verification stage; only descriptors live on
    device for the retrieval matmul.
    """

    def __init__(self, frame_capacity: int = 256, kp_capacity: int = 512,
                 desc_words: int = 64, desc_dtype=np.uint8):
        self.frame_cap = frame_capacity
        self.kp_cap = kp_capacity
        self.desc = np.zeros((frame_capacity, kp_capacity, desc_words),
                             desc_dtype)
        self.mask = np.zeros((frame_capacity, kp_capacity), bool)
        self.occupied = np.zeros(frame_capacity, bool)
        self.kf_ids: List[Optional[int]] = [None] * frame_capacity
        self.slot_of = {}
        # host-side geometry for verification
        self.bearings: List[Optional[np.ndarray]] = [None] * frame_capacity
        self.landmarks: List[Optional[np.ndarray]] = [None] * frame_capacity
        self.lm_valid: List[Optional[np.ndarray]] = [None] * frame_capacity
        self._order: List[int] = []  # insertion order of kf ids
        self._device_desc = None
        self._device_mask = None
        self._dirty = True

    def __len__(self) -> int:
        return int(self.occupied.sum())

    def insert(self, kf_id: int, desc: np.ndarray, mask: np.ndarray,
               bearings: np.ndarray, landmarks: np.ndarray,
               lm_valid: np.ndarray) -> None:
        """Add a keyframe; evicts the oldest when full (ring replacement)."""
        if kf_id in self.slot_of:
            return
        free = np.nonzero(~self.occupied)[0]
        if len(free):
            slot = int(free[0])
        else:
            oldest = self._order.pop(0)
            slot = self.slot_of.pop(oldest)
        k = min(len(desc), self.kp_cap)
        self.desc[slot] = 0
        self.mask[slot] = False
        self.desc[slot, :k] = desc[:k]
        self.mask[slot, :k] = mask[:k]
        self.occupied[slot] = True
        self.kf_ids[slot] = kf_id
        self.slot_of[kf_id] = slot
        # geometry padded to kp_cap so the verification program is fixed-shape
        brg = np.zeros((self.kp_cap, 3))
        lms = np.zeros((self.kp_cap, 3))
        val = np.zeros(self.kp_cap, bool)
        brg[:k] = bearings[:k]
        lms[:k] = landmarks[:k]
        val[:k] = lm_valid[:k]
        self.bearings[slot] = brg
        self.landmarks[slot] = lms
        self.lm_valid[slot] = val
        self._order.append(kf_id)
        self._dirty = True

    def remove(self, kf_id: int) -> None:
        slot = self.slot_of.pop(kf_id, None)
        if slot is None:
            return
        self.occupied[slot] = False
        self.kf_ids[slot] = None
        self._order.remove(kf_id)
        self._dirty = True

    def _sync_device(self) -> None:
        if self._dirty or self._device_desc is None:
            self._device_desc = jnp.asarray(self.desc)
            self._device_mask = jnp.asarray(self.mask)
            self._dirty = False

    def query(self, desc_q: np.ndarray, mask_q: np.ndarray,
              exclude_ids: set, vote_threshold: int = 60,
              use_mxu: bool = True) -> Tuple[Optional[int], float,
                                             np.ndarray]:
        """Best loop candidate (kf_id, score, all scores); None if db empty."""
        if len(self) == 0:
            return None, 0.0, np.zeros(self.frame_cap, np.float32)
        self._sync_device()
        allowed = self.occupied.copy()
        for kf_id in exclude_ids:
            s = self.slot_of.get(kf_id)
            if s is not None:
                allowed[s] = False
        if not allowed.any():
            return None, 0.0, np.zeros(self.frame_cap, np.float32)
        kq = min(len(desc_q), self.kp_cap)
        dq = np.zeros((self.kp_cap, self.desc.shape[2]), self.desc.dtype)
        mq = np.zeros(self.kp_cap, bool)
        dq[:kq] = desc_q[:kq]
        mq[:kq] = mask_q[:kq]
        res = score_against_database(
            jnp.asarray(dq), jnp.asarray(mq), self._device_desc,
            self._device_mask, jnp.asarray(allowed),
            vote_threshold=vote_threshold, use_mxu=use_mxu)
        idx = int(res.best_index)
        score = float(res.best_score)
        kf_id = self.kf_ids[idx] if score >= 0 else None
        return kf_id, max(score, 0.0), np.asarray(res.scores)

    def geometry_of(self, kf_id: int):
        s = self.slot_of[kf_id]
        return (self.desc[s], self.mask[s], self.bearings[s],
                self.landmarks[s], self.lm_valid[s])
