from changegen_spark.sinks.oscxml import write_osmchange

__all__ = ["write_osmchange"]
