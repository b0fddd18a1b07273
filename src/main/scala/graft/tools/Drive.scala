package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // REAL encoder payloads through the Spark-side batched decode
    def bytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, bytes("jpg", 123, 45)),
      (2L, bytes("png", 7, 9)),
      (3L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    ).toDF("id", "payload")
    graft.pipeline.Multimodal
      .extractFeatures(df, "id", "payload", "image", featureDim = 8)
      .select("id", "n_bytes", "width", "height")
      .orderBy("id")
      .show()
  }
}
