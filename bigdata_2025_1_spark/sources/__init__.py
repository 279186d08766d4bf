"""Source/sink shapes (SURVEY §2.A): Kafka message shape (batch parity),
directory text source semantics, structured stats sink."""
