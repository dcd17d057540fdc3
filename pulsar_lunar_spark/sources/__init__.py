"""Sources/sinks: the Pulsar-style message log (topics, subscriptions)."""

from pulsar_lunar_spark.sources.log import MessageLog

__all__ = ["MessageLog"]
