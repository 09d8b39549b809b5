from .handeye import (
    HandEyeConfig,
    HandEyeResult,
    HandEyeState,
    handeye_add_pair,
    handeye_init,
    handeye_solve,
)
