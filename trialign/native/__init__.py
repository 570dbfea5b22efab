from trialign.native.build import (  # noqa: F401
    build,
    is_available,
    score_native,
    score_native_batch,
)
