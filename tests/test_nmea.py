"""NMEA sentence ingestion (reference `nmea_sentence_parser.hpp:11`)."""
import numpy as np

from lmsf_slam_tpu.estimator import NmeaStream, lla_to_enu, make_enu_frame, parse_nmea

# real-world-format sentences (checksums computed for these exact bodies)
GGA = (
    "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"
)
RMC = "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"


def _cksum(body: str) -> str:
    acc = 0
    for ch in body:
        acc ^= ord(ch)
    return f"${body}*{acc:02X}"


def test_gga_parse():
    fix = parse_nmea(GGA)
    assert fix is not None
    lat, lon, alt = fix.lla
    assert abs(lat - (48 + 7.038 / 60)) < 1e-9
    assert abs(lon - (11 + 31.0 / 60)) < 1e-9
    assert alt == 545.4
    assert fix.quality == 1 and fix.n_sats == 8
    assert abs(fix.hdop - 0.9) < 1e-12
    assert abs(fix.utc - (12 * 3600 + 35 * 60 + 19)) < 1e-6


def test_rmc_parse_and_hemispheres():
    fix = parse_nmea(RMC)
    assert fix is not None and fix.quality == 1
    south = _cksum("GPRMC,000001,A,4807.038,S,01131.000,W,0.0,0.0,010100,,")
    fx = parse_nmea(south)
    assert fx.lla[0] < 0 and fx.lla[1] < 0


def test_rejects_bad_checksum_void_and_garbage():
    assert parse_nmea(GGA[:-1] + "0") is None  # corrupted checksum
    void = _cksum("GPRMC,123519,V,4807.038,N,01131.000,E,,,230394,,")
    assert parse_nmea(void) is None  # void fix
    nofix = _cksum("GPGGA,123519,4807.038,N,01131.000,E,0,00,,,M,,M,,")
    assert parse_nmea(nofix) is None  # quality 0
    assert parse_nmea("lorem ipsum") is None
    assert parse_nmea("$GPXTE,A,A,0.67,L,N*6F") is None  # non-position type


def test_talker_agnostic():
    gn = _cksum("GNGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,,M,,")
    assert parse_nmea(gn) is not None


def test_stream_reassembles_split_sentences():
    s = NmeaStream()
    out = s.feed(GGA[:20])
    assert out == []
    out = s.feed(GGA[20:] + "\r\n" + RMC + "\r\n$GP")
    assert len(out) == 2
    out = s.feed("GGA,,,,,,0,,,,M,,M,,*66\n")  # completes an invalid one
    assert out == []


def test_feeds_enu_pipeline():
    fix = parse_nmea(GGA)
    frame = make_enu_frame(np.asarray(fix.lla))
    enu = lla_to_enu(frame, np.asarray(fix.lla))
    np.testing.assert_allclose(enu, 0.0, atol=1e-9)
