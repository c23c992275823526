"""Batched differentiable geometry: SE(3)/Sim(3) Lie groups, camera models,
triangulation. Replaces the reference's Eigen/g2o/cv math layer
(reference src/Converter.cc, g2o types)."""

from orbslam2_tpu.geometry import se3, sim3, camera, triangulate  # noqa: F401
