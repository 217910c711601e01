from spark_tensors_spark.train.joinmerge import JoinMergeKGETrainer
from spark_tensors_spark.train.optim import SGD, AdaGrad, Adam, RMSprop
from spark_tensors_spark.train.trainer import KGETrainer

__all__ = [
    "SGD", "AdaGrad", "Adam", "RMSprop", "KGETrainer", "JoinMergeKGETrainer",
]
