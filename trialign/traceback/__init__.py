from trialign.traceback.hirschberg import hirschberg_align  # noqa: F401
