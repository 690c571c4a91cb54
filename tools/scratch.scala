val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
ev.printSchema
ev.show(3, false)
