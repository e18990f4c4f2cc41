"""Geometry tier: SE3, Schur-complement bundle adjustment, pose graphs."""
