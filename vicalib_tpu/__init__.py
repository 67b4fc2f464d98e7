"""vicalib_tpu — a TPU-native visual-inertial calibration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of arpg/vicalib:
camera intrinsics (6 models), camera-to-camera and camera-to-IMU extrinsics,
IMU biases/scale factors, gravity direction, per-frame target poses and the
camera<->IMU time offset, estimated by a staged batched Levenberg-Marquardt
solver with analytic (autodiff-exact) Jacobians, Schur-complement frame
elimination, and device-mesh sharding for multi-chip scaling.
"""

__version__ = "0.1.0"
