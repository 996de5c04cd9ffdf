import java.awt.image.BufferedImage;
import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.util.Iterator;

import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.MemoryCacheImageOutputStream;

import org.apache.spark.sql.api.java.UDF2;

/**
 * JVM-side image TRANSCODE for the Spark pipeline: byte[] payload +
 * quality (0-100) -> long[]{width, height, inBytes, outBytes,
 * outSumPx} after decoding the payload, re-encoding it as baseline
 * JPEG at the requested quality, and DECODING ITS OWN OUTPUT
 * (outSumPx = pixel sum of the re-encoded image — every row proves
 * its output is a valid JPEG with bounded drift, at the cost of one
 * extra decode the throughput numbers absorb). The ENCODE
 * counterpart of ImageStatsUdf — together they cover both directions
 * of the javax.imageio throughput experiment (the numpy codecs
 * remain the oracle path, the progressive encoder, and the no-jar
 * fallback).
 *
 * Public-knowledge only: javax.imageio ships with every JDK.
 */
public class ImageTranscodeUdf implements UDF2<byte[], Integer, long[]> {
    static {
        // see ImageStatsUdf: the default temp-FILE stream cache
        // serializes concurrent tasks on /tmp churn.
        ImageIO.setUseCache(false);
    }

    @Override
    public long[] call(byte[] payload, Integer quality) throws Exception {
        if (payload == null || quality == null) {
            return null;
        }
        BufferedImage img;
        try {
            img = ImageIO.read(new ByteArrayInputStream(payload));
        } catch (Exception e) {
            // ImageIO.read returns null only for UNRECOGNIZED formats;
            // recognized-but-corrupt bytes (truncated JPEG, CMYK)
            // throw. Per-row tolerance means both become null — one
            // bad payload must not abort a 500k-image stage.
            return null;
        }
        if (img == null) {
            return null;
        }
        // JPEG writers reject images with alpha; normalize to RGB.
        if (img.getColorModel().hasAlpha()) {
            BufferedImage rgb = new BufferedImage(
                img.getWidth(), img.getHeight(),
                BufferedImage.TYPE_INT_RGB);
            java.awt.Graphics2D g = rgb.createGraphics();
            try {
                g.drawImage(img, 0, 0, null);
            } finally {
                g.dispose();
            }
            img = rgb;
        }
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        if (!it.hasNext()) {
            return null;
        }
        ImageWriter writer = it.next();
        try {
            ImageWriteParam p = writer.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(
                Math.max(0, Math.min(100, quality)) / 100.0f);
            ByteArrayOutputStream bos = new ByteArrayOutputStream();
            MemoryCacheImageOutputStream out =
                new MemoryCacheImageOutputStream(bos);
            try {
                writer.setOutput(out);
                writer.write(null, new IIOImage(img, null, null), p);
            } finally {
                out.close(); // flushes and frees the memory cache
            }
            byte[] encoded = bos.toByteArray();
            BufferedImage back;
            try {
                back = ImageIO.read(new ByteArrayInputStream(encoded));
            } catch (Exception e) {
                // Same per-row tolerance as the input decode: a
                // throwing self-check must fail THIS row, not the
                // 500k-image stage.
                back = null;
            }
            if (back == null) {
                return null; // self-check failed: output not decodable
            }
            java.awt.image.Raster r = back.getRaster();
            int w = r.getWidth(), h = r.getHeight(),
                c = r.getNumBands();
            long sum = 0;
            int[] row = new int[w * c];
            for (int y = 0; y < h; y++) {
                r.getPixels(0, y, w, 1, row);
                for (int i = 0; i < w * c; i++) {
                    sum += row[i];
                }
            }
            return new long[]{img.getWidth(), img.getHeight(),
                              payload.length, encoded.length, sum};
        } finally {
            writer.dispose();
        }
    }
}
