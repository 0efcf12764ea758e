from changegen_spark.functions import hashing, similarity, text

__all__ = ["hashing", "similarity", "text"]
