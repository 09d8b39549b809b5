from .eskf import (
    EskfConfig,
    EskfState,
    eskf_init_state,
    eskf_predict,
    eskf_run,
    eskf_update_position,
    eskf_update_wheel,
    static_initialize,
)
from .gnss import EnuFrame, lla_to_ecef, lla_to_enu, make_enu_frame
from .nmea import NmeaFix, NmeaStream, parse_nmea
