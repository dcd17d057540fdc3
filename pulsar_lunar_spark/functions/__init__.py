"""Expression-level helpers: message-envelope serde, payload codecs."""

from pulsar_lunar_spark.functions.envelope import (
    ENVELOPE_SCHEMA,
    decode_payload,
    verify_payload_integrity,
    to_envelope,
)

__all__ = ["ENVELOPE_SCHEMA", "to_envelope", "decode_payload", "verify_payload_integrity"]
