package exsparktest;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-support mock: serves any URI scheme (registered via
 * fs.&lt;scheme&gt;.impl) from the LOCAL filesystem by URI path. Lets the
 * S3 contract test drive resolve_path -> fs.s3a.* conf install ->
 * distributed parquet/csv scan end-to-end without an object store or the
 * hadoop-aws jar. The authority (bucket) is accepted and ignored, like a
 * path-style S3 layout rooted at /.
 */
public class MockS3FileSystem extends RawLocalFileSystem {
  private URI uri = URI.create("s3a:///");

  @Override
  public URI getUri() {
    // the superclass constructor calls getUri() BEFORE this class's
    // field initializers run -- fall back to the default scheme then
    return uri != null ? uri : URI.create("s3a:///");
  }

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    String auth = name.getAuthority() == null ? "" : name.getAuthority();
    this.uri = URI.create(name.getScheme() + "://" + auth + "/");
    super.initialize(name, conf);
  }

  @Override
  protected void checkPath(Path path) {
    // accept any scheme/authority: the mock maps URI path -> local path
  }
}
