from mspr2_back_spark.functions.numeric import avg_of, money, money6, dsum

__all__ = ["avg_of", "money", "money6", "dsum"]
