import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.ByteArrayInputStream;

import javax.imageio.ImageIO;

import org.apache.spark.sql.api.java.UDF1;

/**
 * JVM-side image decode for the Spark pipeline: byte[] (JPEG/PNG/BMP/
 * GIF — whatever the JDK's ImageIO service loaders handle) ->
 * long[]{width, height, channels, sumPx, minPx, maxPx} over all
 * samples, mirroring pipeline/multimodal.image_features's numpy
 * surface so the two paths are comparable row-for-row.
 *
 * Public-knowledge only: javax.imageio ships with every JDK — zero
 * pip/apt dependencies, which is the whole point (the numpy codec
 * remains the no-JVM-deployment fallback and the oracle path).
 * Registered via spark.udf.registerJavaFunction from a jar passed in
 * spark.jars; see scripts/build_jvm_udf.sh.
 */
public class ImageStatsUdf implements UDF1<byte[], long[]> {
    static {
        // default ImageIO behavior spools every InputStream read
        // through a temp-FILE cache — 32 concurrent tasks serialize
        // on /tmp file churn (measured: the 500k-image tier DEGRADED
        // run-over-run, 14.8 s then 28.8 s). In-memory payloads need
        // the memory-cache stream.
        ImageIO.setUseCache(false);
    }

    @Override
    public long[] call(byte[] payload) throws Exception {
        if (payload == null) {
            return null;
        }
        BufferedImage img;
        try {
            img = ImageIO.read(new ByteArrayInputStream(payload));
        } catch (Exception e) {
            return null; // recognized-but-corrupt bytes throw, not null
        }
        if (img == null) {
            return null; // unrecognized payload: let Spark keep the row
        }
        Raster r = img.getRaster();
        int w = r.getWidth(), h = r.getHeight(), c = r.getNumBands();
        long sum = 0, min = 255, max = 0;
        int[] row = new int[w * c];
        for (int y = 0; y < h; y++) {
            r.getPixels(0, y, w, 1, row);
            for (int i = 0; i < w * c; i++) {
                int v = row[i];
                sum += v;
                if (v < min) min = v;
                if (v > max) max = v;
            }
        }
        return new long[]{w, h, c, sum, min, max};
    }
}
