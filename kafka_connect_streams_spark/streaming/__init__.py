"""Structured Streaming layer: the Kafka Streams topology surface.

- ``wordcount`` — the flagship streaming pipeline (KafkaWordCount parity)
- ``joins``     — windowed stream-stream joins with watermarks (J1-J4)
- ``state``     — queryable state via memory-sink snapshots (ST4)
"""
