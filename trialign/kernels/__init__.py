from trialign.kernels.plane_math import transition_groups, target_update  # noqa: F401
