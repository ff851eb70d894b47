# SnelDB Ruby client (zero-dependency: socket, net/http, openssl, json).
#
# API parity with the reference's packaged Ruby client (reference:
# clients/ruby/sneldb-rb/lib — URL-based transport selection, raising
# bang methods plus a non-raising `execute` returning
# {success:, data:, error:}, HMAC-SHA256 auth), implemented against
# this repo's wire protocol:
#
# - tcp://host:port  — newline-delimited command in, JSON frames out
#   (`schema` / `batch` / `end` for reads, one `ok` / `error` line for
#   writes). Auth: stateless inline `user:sig:<cmd>` (sig = HMAC-SHA256
#   of the command text) or the `AUTH user:sig` handshake answering
#   `OK TOKEN <t>`, then `<cmd> TOKEN <t>`.
# - http://host:port — POST /command with the command as body; same
#   frame lines in the response body. Credentials ride as `X-Auth-Token`
#   or `X-Auth-User` + `X-Auth-Signature` (signature over the body).
#
# Usage:
#   require_relative "sneldb"
#   client = SnelDB::Client.connect("tcp://localhost:7171")
#   client.define!("orders", { "amount" => "int" })
#   client.store!("orders", "c1", { "amount" => 10 })
#   client.flush!
#   rows = client.query!("QUERY orders WHERE amount >= 5")
#   client.close

require "json"
require "net/http"
require "openssl"
require "socket"
require "uri"

module SnelDB
  class Error < StandardError; end
  class CommandError < Error; end
  class AuthenticationError < Error; end
  class ConnectionError < Error; end

  def self.sign(secret_key, message)
    OpenSSL::HMAC.hexdigest("SHA256", secret_key, message)
  end

  # Folds a list of parsed frame hashes into rows-of-hashes (reads) or a
  # message string (writes); raises on an error frame.
  module Frames
    module_function

    def fold(frames)
      columns = nil
      rows = []
      message = nil
      frames.each do |f|
        case f["type"]
        when "schema"
          columns = f["columns"]
        when "batch"
          (f["rows"] || []).each do |r|
            rows << (columns ? columns.zip(r).to_h : r)
          end
        when "ok"
          message = f["message"] || ""
        when "error"
          msg = f["message"] || ""
          klass =
            if msg.include?("Authentication") || msg.include?("Authorization") ||
               %w[401 403 429].include?(msg[0, 3])
              AuthenticationError
            else
              CommandError
            end
          raise klass, msg
        end
      end
      columns ? rows : message
    end

    def parse_lines(text)
      text.split("\n").reject { |l| l.strip.empty? }.map { |l| JSON.parse(l) }
    end
  end

  class TcpTransport
    def initialize(host, port, read_timeout)
      @host = host
      @port = port
      @read_timeout = read_timeout
      @sock = Socket.tcp(host, port, connect_timeout: read_timeout)
    rescue SystemCallError => e
      raise ConnectionError, "connect #{host}:#{port}: #{e.message}"
    end

    # One command line -> all frames up to end/ok/error.
    def round_trip(line)
      @sock.write(line + "\n")
      frames = []
      loop do
        raw = read_line
        raise ConnectionError, "connection closed mid-response" if raw.nil?
        next if raw.strip.empty?
        frame = JSON.parse(raw)
        frames << frame
        break if %w[end ok error].include?(frame["type"])
      end
      frames
    end

    def close
      @sock&.close
      @sock = nil
    end

    private

    # Own line buffer over recv (not IO#gets) so wait_readable and the
    # read path agree about buffered bytes.
    def read_line
      @buf ||= +""
      until (idx = @buf.index("\n"))
        if @sock.wait_readable(@read_timeout).nil?
          raise ConnectionError, "read timeout after #{@read_timeout}s"
        end
        chunk = @sock.recv(65_536)
        return nil if chunk.nil? || chunk.empty?
        @buf << chunk
      end
      @buf.slice!(0..idx)
    end
  end

  class HttpTransport
    def initialize(host, port, read_timeout)
      @host = host
      @port = port
      @read_timeout = read_timeout
    end

    def post(body, headers)
      http = Net::HTTP.new(@host, @port)
      http.read_timeout = @read_timeout
      req = Net::HTTP::Post.new("/command")
      headers.each { |k, v| req[k] = v }
      req.body = body
      res = http.request(req)
      res.body.to_s
    rescue SystemCallError, Net::OpenTimeout, Net::ReadTimeout => e
      raise ConnectionError, "POST #{@host}:#{@port}: #{e.message}"
    end

    def close; end
  end

  class Client
    attr_reader :user_id

    def self.connect(url, user_id: nil, secret_key: nil, read_timeout: 60)
      new(base_url: url, user_id: user_id, secret_key: secret_key,
          read_timeout: read_timeout)
    end

    def initialize(base_url:, user_id: nil, secret_key: nil, read_timeout: 60)
      uri = URI.parse(base_url)
      @user_id = user_id
      @secret_key = secret_key
      @token = nil
      @scheme = uri.scheme
      case uri.scheme
      when "tcp"
        @transport = TcpTransport.new(uri.host, uri.port, read_timeout)
      when "http"
        @transport = HttpTransport.new(uri.host, uri.port, read_timeout)
      else
        raise ArgumentError, "unsupported scheme: #{uri.scheme} (tcp/http)"
      end
    end

    # -- raw execution ----------------------------------------------------

    # Raising flavor: rows-of-hashes for reads, message string for writes.
    def execute!(command)
      if @scheme == "tcp"
        Frames.fold(@transport.round_trip(tcp_line(command)))
      else
        body = Frames.parse_lines(@transport.post(command, http_headers(command)))
        Frames.fold(body)
      end
    end

    # Non-raising flavor (reference client.rb:79): never raises for
    # command/auth failures, returns { success:, data:, error: }.
    def execute(command)
      { success: true, data: execute!(command), error: nil }
    rescue Error => e
      { success: false, data: nil, error: e }
    rescue StandardError => e
      { success: false, data: nil,
        error: Error.new("Unexpected error: #{e.class} - #{e.message}") }
    end

    # AUTH handshake (TCP only): mints a session token used by later
    # commands (`<cmd> TOKEN <t>`), replacing per-command signing.
    def authenticate!
      unless @scheme == "tcp"
        raise AuthenticationError, "AUTH is only supported on tcp://"
      end
      unless @user_id && @secret_key
        raise AuthenticationError, "user_id and secret_key required"
      end
      sig = SnelDB.sign(@secret_key, @user_id)
      msg = Frames.fold(@transport.round_trip("AUTH #{@user_id}:#{sig}"))
      token = msg.to_s[/OK TOKEN (\S+)/, 1]
      raise AuthenticationError, "no token in AUTH reply: #{msg}" unless token
      @token = token
    end

    def close
      @transport.close
    end

    # -- convenience commands (bang = raising, plain = {success:,...}) ----

    def define!(event_type, fields, version: nil)
      as = version ? " AS #{version}" : ""
      execute!("DEFINE #{event_type}#{as} FIELDS #{JSON.generate(fields)}")
    end

    def store!(event_type, context_id, payload)
      execute!(
        "STORE #{event_type} FOR #{context_id} PAYLOAD #{JSON.generate(payload)}"
      )
    end

    # Bulk STORE via BATCH round trips of batch_size events — one reply
    # and one server-side WAL group-commit flush per batch instead of
    # per event. events: [[context_id, payload], ...]; raises on the
    # first failed batch.
    def store_many!(event_type, events, batch_size: 100)
      size = [batch_size, 1].max
      last = "OK"  # empty events: same OK default as the Python/JS ports
      events.each_slice(size) do |chunk|
        body = chunk.map do |ctx, payload|
          "STORE #{event_type} FOR #{ctx} PAYLOAD #{JSON.generate(payload)}"
        end.join("; ")
        last = execute!("BATCH [ #{body} ]")
      end
      last
    end

    def query!(command_or_type)
      cmd = command_or_type.to_s
      cmd = "QUERY #{cmd}" unless cmd =~ /\A(QUERY|FIND|COMPARE|PLOT)\b/i
      execute!(cmd)
    end

    def replay!(context_id, event_type: nil)
      type_part = event_type ? "#{event_type} " : ""
      execute!("REPLAY #{type_part}FOR #{context_id}")
    end

    def flush!
      execute!("FLUSH")
    end

    def ping!
      execute!("PING") == "PONG"
    end

    %i[define store query replay flush ping].each do |name|
      define_method(name) do |*args, **kw|
        { success: true, data: send("#{name}!", *args, **kw), error: nil }
      rescue Error => e
        { success: false, data: nil, error: e }
      end
    end

    private

    def tcp_line(command)
      return "#{command} TOKEN #{@token}" if @token
      if @user_id && @secret_key
        sig = SnelDB.sign(@secret_key, command)
        "#{@user_id}:#{sig}:#{command}"
      else
        command
      end
    end

    def http_headers(body)
      return { "X-Auth-Token" => @token } if @token
      if @user_id && @secret_key
        {
          "X-Auth-User" => @user_id,
          "X-Auth-Signature" => SnelDB.sign(@secret_key, body),
        }
      else
        {}
      end
    end
  end
end
